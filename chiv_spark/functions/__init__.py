from chiv_spark.functions.hashing import hash64, hash64_seeded
from chiv_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["cosine_similarity", "dot", "hash64", "hash64_seeded", "l2_norm"]
