"""Training-data pipeline operators beyond the reference's surface
(driver mandate): deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search (brute-force + IVF-bucketed ANN),
text analysis, and multimodal column plumbing.

All hot paths are JVM-side pyspark.sql.functions expressions; Python
appears only in the multimodal decode UDFs (Arrow-batched)."""
