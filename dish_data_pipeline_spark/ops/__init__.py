"""Extension operators for large-scale training-data pipelines
(SURVEY.md §2.13, §7.7): text analysis, exact/fuzzy dedup,
similarity search, multimodal columns.

These go beyond the reference surface by charter; each is designed
shuffle-bounded for 100 TB (LSH banding instead of all-pairs, no
driver-side collects).
"""
