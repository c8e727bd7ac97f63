"""Large-scale training-data operators over the documents/embeddings tables:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), approximate-nearest-neighbor search, and multimodal
decode plumbing.  All Ray-Data-first: vectorized map_batches + the minimum
number of shuffles (partial-aggregate before groupby, broadcast small sides).
"""
