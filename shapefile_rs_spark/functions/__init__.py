"""The engine's Column-expression surface in one import, mirroring the
role of ``pyspark.sql.functions``: every reusable expression builder the
operators are composed from, so users can assemble their own plans from
the same JVM-side (or Arrow-batched) primitives.

>>> from shapefile_rs_spark import functions as SF
>>> df.select(SF.cell_id_col(F.col("lon"), F.col("lat"), 8))
"""

from ..cells import cell_id_col
from ..operators.dedup import (
    lsh_band_keys,
    minhash_from_hashes,
    minhash_signature,
    ngram_jaccard,
    shingle_hashes,
    simhash_from_hashes,
    token_hashes,
    word_shingles,
)
from ..operators.knn import dist2_col
from ..operators.similarity import cosine_expr, cosine_pd, dot_expr, norm2_expr
from ..operators.textstats import char_minhash, winnow_fingerprint
from ..operators.tiles import tile_x_col, tile_y_col
from ..operators.urltools import canonicalize_url

__all__ = [
    "cell_id_col",
    "tile_x_col",
    "tile_y_col",
    "dist2_col",
    "dot_expr",
    "norm2_expr",
    "cosine_expr",
    "cosine_pd",
    "word_shingles",
    "shingle_hashes",
    "minhash_from_hashes",
    "minhash_signature",
    "lsh_band_keys",
    "token_hashes",
    "simhash_from_hashes",
    "ngram_jaccard",
    "char_minhash",
    "winnow_fingerprint",
    "canonicalize_url",
]
