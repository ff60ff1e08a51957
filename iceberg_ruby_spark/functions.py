"""SQL-registrable function surface (Tier C: UDF / pandas_udf / UDTF).

The reference has no function-extension surface at all; this module is the
Spark-native one a pipeline user expects: ``register_functions(spark)``
registers ``icb_*`` SQL functions so ``catalog.sql()`` queries can call the
engine's text/similarity primitives.

SQL registration requires real UDFs, so these are Arrow-batched pandas
implementations.  The DataFrame API equivalents in ``operators/text.py``
remain pure Column expressions (JVM-side, whole-stage codegen) — prefer
those in hot paths; tests assert the two stay value-identical.
"""

from __future__ import annotations

import hashlib
import re as _re

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# pandas lazily imported: the engine import must stay light for the
# streaming micro-batch Python workers (see transforms.py); pandas_udf
# resolves the pd.Series hints against these globals when
# register_functions runs
pd = None


def _ensure_pd():
    global pd
    if pd is None:
        import pandas

        globals()["pd"] = pandas
    return pd



def _simhash64_py(text) -> int:
    """64-bit SimHash over whitespace tokens."""
    if text is None:
        return None
    acc = [0] * 64
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


def _fingerprint_py(text) -> str:
    if text is None:
        return None
    normalized = _re.sub(r"\s+", " ", _re.sub(r"[^\w\s]", "", text.lower())).strip()
    return hashlib.md5(normalized.encode()).hexdigest()


def _token_count_py(text) -> int:
    if text is None:
        return None
    t = text.strip()
    return len(t.split()) if t else 0


def _language_id_py(text) -> str:
    if text is None:
        return None
    # imported here, not at module scope: operators/__init__ pulls the whole
    # operator surface (pandas, numpy) — too heavy for the engine import the
    # streaming Python workers pay per spawn
    from iceberg_ruby_spark.operators.text import STOPWORDS

    toks = set(text.lower().strip().split())
    hits = {lang: len(toks & set(STOPWORDS[lang])) for lang in sorted(STOPWORDS)}
    best = max(hits.values(), default=0)
    if best == 0:
        return "und"
    for lang in sorted(hits):
        if hits[lang] == best:
            return lang
    return "und"


def register_functions(spark: SparkSession) -> list[str]:
    """Register the ``icb_*`` SQL functions on this session; returns the
    registered names.  Idempotent (re-registration replaces)."""
    _ensure_pd()

    @F.pandas_udf("int")
    def icb_token_count(s: pd.Series) -> pd.Series:
        return s.map(_token_count_py).astype("Int32")

    @F.pandas_udf("string")
    def icb_language_id(s: pd.Series) -> pd.Series:
        return s.map(_language_id_py)

    @F.pandas_udf("string")
    def icb_fingerprint(s: pd.Series) -> pd.Series:
        return s.map(_fingerprint_py)

    @F.pandas_udf("long")
    def icb_simhash(s: pd.Series) -> pd.Series:
        return s.map(_simhash64_py).astype("Int64")

    @F.pandas_udf("string")
    def icb_strip_html(s: pd.Series) -> pd.Series:
        import re as _re

        def strip(x):
            if x is None:
                return ""
            # the same RE2-compatible rule chain operators/text.strip_html
            # runs JVM-side (that Column form is the hot path; this UDF is
            # the SQL-callable convenience)
            x = _re.sub(r"(?is)<script[^>]*>.*?</script>", " ", x)
            x = _re.sub(r"(?is)<style[^>]*>.*?</style>", " ", x)
            x = _re.sub(r"(?s)<!--.*?-->", " ", x)
            x = _re.sub(r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n", x)
            x = _re.sub(r"<[^>]+>", " ", x)
            for ent, ch in (
                ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
            ):
                x = x.replace(ent, ch)
            x = _re.sub(r"[ \t]+", " ", x)
            x = _re.sub(r" ?\n ?", "\n", x)
            x = _re.sub(r"\n{3,}", "\n\n", x)
            return _re.sub(r"^\s+|\s+$", "", x)

        return s.map(strip)

    @F.pandas_udf("double")
    def icb_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        def cos(x, y):
            if x is None or y is None:
                return None
            xv, yv = np.asarray(x, dtype=float), np.asarray(y, dtype=float)
            d = float(np.linalg.norm(xv) * np.linalg.norm(yv))
            return float(np.dot(xv, yv) / d) if d else None

        return pd.Series([cos(x, y) for x, y in zip(a, b)])

    registered = []
    for name, fn in [
        ("icb_token_count", icb_token_count),
        ("icb_language_id", icb_language_id),
        ("icb_fingerprint", icb_fingerprint),
        ("icb_simhash", icb_simhash),
        ("icb_cosine", icb_cosine),
        ("icb_strip_html", icb_strip_html),
    ]:
        spark.udf.register(name, fn)
        registered.append(name)

    # UDTF: explode a document into (pos, shingle) rows
    try:
        from pyspark.sql.functions import udtf

        @udtf(returnType="pos: int, shingle: string")
        class IcbShingles:
            def eval(self, text: str, size: int):
                if text is None:
                    return
                norm = " ".join(text.lower().split())
                n = max(len(norm) - size + 1, 1)
                for i in range(n):
                    yield i, norm[i : i + size]

        spark.udtf.register("icb_shingles", IcbShingles)
        registered.append("icb_shingles")
    except ImportError:  # pragma: no cover - pyspark < 3.5
        pass

    return registered
