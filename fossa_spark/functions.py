"""Public function surface of the engine — one import point for the
column-level operators the library adds on top of pyspark.sql.functions.

    from fossa_spark import functions as FF
    df.select(FF.fingerprint("text"), FF.token_count_ws("text"))
"""

from fossa_spark.llm.dedup import (
    normalize,
    simhash,
    word_shingles,
)
from fossa_spark.llm.similarity import cosine, cosine_batch, dot, norm
from fossa_spark.llm.text import (
    fingerprint,
    token_count_regex,
    token_count_ws,
    tokens,
)
from fossa_spark.queries._util import cents, uncents

__all__ = [
    "normalize",
    "simhash",
    "word_shingles",
    "cosine",
    "cosine_batch",
    "dot",
    "norm",
    "fingerprint",
    "token_count_regex",
    "token_count_ws",
    "tokens",
    "cents",
    "uncents",
]
