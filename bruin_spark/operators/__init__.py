"""Large-scale data-processing operators beyond the reference's surface.

These are the operations a 100 TB training-data pipeline needs — dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search, text analysis, multimodal column plumbing. All are
pure DataFrame programs over built-in functions (JVM-side, whole-stage
codegen); Python appears only in clearly-marked Arrow-batched UDF slots.
"""
