"""Wave-based crawl engine (SURVEY §2.1 C1-C14).

The reference's 96-thread FIFO crawler (crawler/Crawler.java,
crawler/CrawlTask.java) becomes a BFS *wave loop*: one DataFrame job per
depth generation, with all state (frontier, URL-seen set, robots cache,
image payloads, link graph) in snapshot-committed parquet tables so a crawl
is resumable from any wave boundary.
"""
