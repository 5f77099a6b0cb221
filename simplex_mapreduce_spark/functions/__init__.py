from simplex_mapreduce_spark.functions.textfn import (
    STOPWORD_RE,
    TOKEN_RE,
    tokens_col,
    shingles_col,
)

__all__ = ["STOPWORD_RE", "TOKEN_RE", "tokens_col", "shingles_col"]
