"""Mojibake repair — the ftfy-style fix for UTF-8 text that was at
some point decoded as Windows-1252 ("Ã©" for "é", "â€”" for "—"),
the single most common encoding damage in web corpora (ftfy's core
`fix_encoding` trick, restated minimally and deterministically).

The repair is the inverse roundtrip: re-ENCODE the damaged string as
cp1252 (recovering the original UTF-8 bytes) and DECODE those bytes as
UTF-8. Applied only while the text carries a mojibake marker sequence
and the strict roundtrip succeeds and changes something, up to
``max_iters`` times (doubly-damaged text needs two passes). Anything
the strict codecs reject — including genuinely non-Latin text like
CJK, which cp1252 cannot encode — is left byte-identical, so the
operator is safe to run corpus-wide.

Scale shape: one vectorized Arrow batch boundary (`pandas_udf`) over
the text column — the same single-Python-crossing discipline as
extraction; no shuffle at all. The UDF maps the pure kernel
:func:`fix_mojibake_text`, and the driver oracle reuses the SAME
kernel, so Spark-vs-oracle can only diverge if the plumbing is wrong.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# high-yield prefixes of cp1252-decoded UTF-8 lead bytes: C3/C2/E2…
# as cp1252 glyphs. A plain-ASCII page contains none of them, so the
# roundtrip is attempted only where damage is plausible.
MOJIBAKE_MARKERS = ("Ã", "Â", "â€", "Å", "Ä", "Î", "Ð", "Ñ", "Ø")
MAX_ITERS = 3


def fix_mojibake_text(text: str, max_iters: int = MAX_ITERS
                      ) -> tuple[str, int]:
    """Pure kernel: → (fixed_text, n_iters). Never raises; returns
    the input unchanged when no marker is present or the strict
    cp1252→utf-8 roundtrip fails or stops changing the string."""
    fixed = text
    iters = 0
    for _ in range(max_iters):
        if not any(m in fixed for m in MOJIBAKE_MARKERS):
            break
        try:
            cand = fixed.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            break
        if cand == fixed:
            break
        fixed = cand
        iters += 1
    return fixed, iters


def fix_mojibake(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 max_iters: int = MAX_ITERS) -> DataFrame:
    """docs → (id_col, changed, n_iters, fixed_md5); join the fixed
    text back by id when the full column is wanted (the md5 keeps the
    driver-gate row narrow)."""

    @F.pandas_udf("struct<fixed:string, n_iters:int>")
    def _fix(texts: pd.Series) -> pd.DataFrame:
        rows = [fix_mojibake_text(t if isinstance(t, str) else "",
                                  max_iters) for t in texts]
        return pd.DataFrame(rows, columns=["fixed", "n_iters"])

    out = docs.select(F.col(id_col), F.col(text_col).alias("_t"),
                      _fix(F.col(text_col)).alias("_r"))
    return out.select(
        F.col(id_col),
        (F.col("_r.fixed") != F.col("_t")).alias("changed"),
        F.col("_r.n_iters").alias("n_iters"),
        F.md5(F.col("_r.fixed")).alias("fixed_md5"))


def fix_mojibake_oracle(docs: list, max_iters: int = MAX_ITERS) -> list:
    """[(doc_id, text)] → [(doc_id, changed, n_iters, fixed_md5)] via
    the same kernel."""
    import hashlib
    out = []
    for doc_id, text in sorted(docs):
        fixed, iters = fix_mojibake_text(text, max_iters)
        out.append((doc_id, fixed != text, iters,
                    hashlib.md5(fixed.encode("utf-8")).hexdigest()))
    return out


def corrupt_utf8_as_cp1252(text: str, times: int = 1) -> str:
    """Deterministic damage injector for tests/fixtures: the exact
    inverse of one repair pass (UTF-8 bytes misread as cp1252).
    Raises if the text contains bytes cp1252 cannot represent —
    fixture text must stick to cp1252-decodable damage."""
    for _ in range(times):
        text = text.encode("utf-8").decode("cp1252")
    return text
