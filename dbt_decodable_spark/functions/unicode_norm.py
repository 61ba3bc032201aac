"""Unicode normalization functions (SURVEY §2.8 string functions).

Spark has no built-in NFC/NFKC expression, so this is one of the few
documented Python-on-the-hot-path cases — implemented as Arrow-batched
``pandas_udf`` (never row-at-a-time): the batch transfers once over Arrow
and ``unicodedata.normalize`` runs vectorized per batch. At 100 TB this is
a pure map stage — no shuffle, parallel over input partitions; normalize
ONCE at ingest and store the result, don't re-normalize per query.

Normalization form notes: NFC composes combining sequences (e +
U+0301 → é) — the canonical storage form; NFKC additionally folds
compatibility characters (ﬁ → fi, ² → 2) — the aggressive form used before
tokenization in training pipelines.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F


def _norm_udf(form: str):
    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return norm


_NFC = None
_NFKC = None


def nfc(col: Column | str) -> Column:
    """Canonical composition (NFC)."""
    global _NFC
    if _NFC is None:
        _NFC = _norm_udf("NFC")
    return _NFC(F.col(col) if isinstance(col, str) else col)


def nfkc(col: Column | str) -> Column:
    """Compatibility composition (NFKC) — ligature/width/superscript folding."""
    global _NFKC
    if _NFKC is None:
        _NFKC = _norm_udf("NFKC")
    return _NFKC(F.col(col) if isinstance(col, str) else col)
