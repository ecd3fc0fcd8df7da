"""Spark-free scaling control: the IDENTICAL per-URL payload work
(synth.page_image: 4:2:0 JPEG encode + decode at 128-224 px) through plain
multiprocessing at 8 vs 32 processes. Separates box-level CPU inflation
(memory bandwidth / vCPU co-scheduling) from engine-side serialization."""
import os, sys, time, resource, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from multiprocessing import Pool

N_PAGES = 12800

def work(args):
    lo, hi = args
    from sher_look_spark.crawler import synth
    web = synth.SynthWebConfig(n_hosts=500, pages_per_host=400, seed=4242,
                               min_links=10, max_links=24, img_min=128,
                               img_max=224, jpeg_every=1)
    t = 0
    for j in range(lo, hi):
        synth.page_image(web, j % 500, j % 400)
        t += 1
    return t

def run(nproc):
    chunk = N_PAGES // nproc
    jobs = [(i * chunk, (i + 1) * chunk) for i in range(nproc)]
    ru0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.time()
    with Pool(nproc) as p:
        total = sum(p.map(work, jobs))
    wall = time.time() - t0
    ru1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    cpu = (ru1.ru_utime - ru0.ru_utime) + (ru1.ru_stime - ru0.ru_stime)
    return {"procs": nproc, "pages": total, "wall_s": round(wall, 1),
            "cpu_s": round(cpu, 1), "pages_per_s": round(total / wall, 1),
            "cpu_ms_per_page": round(1000 * cpu / total, 2)}

if __name__ == "__main__":
    out = {}
    for rep in range(2):
        for n in (8, 32):
            r = run(n)
            out.setdefault(str(n), []).append(r)
            print(json.dumps(r), file=sys.stderr)
    best8 = max(out["8"], key=lambda r: r["pages_per_s"])
    best32 = max(out["32"], key=lambda r: r["pages_per_s"])
    eff = best32["pages_per_s"] / best8["pages_per_s"] / 4.0
    print(json.dumps({"control": "multiprocessing_jpeg_420",
                      "best8": best8, "best32": best32,
                      "efficiency": round(eff, 3),
                      "cpu_inflation_32_vs_8": round(
                          best32["cpu_ms_per_page"] / best8["cpu_ms_per_page"], 2)}))
