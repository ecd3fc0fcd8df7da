"""Relational operator tier: index builder, rankers, dedup, similarity,
text analysis — SURVEY §2.2/§2.3 plus the training-data-pipeline operators
(dedup/ANN/quality) the 100 TB use case needs."""
