"""Text scalar functions as native Spark column expressions.

Each function reimplements a reference helper as a JVM-side expression so it
stays inside whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Parenthetical subtitle: both full-width （…） and ASCII (…) forms.
_PARENTHETICAL = r"[（(][^）)]*[）)]$"

# zh+en punctuation set used by the reference when cleaning train text —
# datatool/pipeline/tools.py:4, extract_embedding_train.py:9.
PUNCT_PATTERN = (
    r"[\"'!#$%&()*+,\-./:;<=>?@\[\]^_`{|}~“”‘’！？｡。＂＃＄％＆＇（）＊＋，－／："
    r"；＜＝＞＠［＼］＾＿｀｛｜｝～《》〈〉「」『』【】〔〕·、]"
)


def surface_norm(title: Column | str) -> Column:
    """Normalized surface form — THE blocking key.

    Strips a trailing parenthetical disambiguator from an entity title and
    lower-cases: ``"矩阵（数学）" → "矩阵"``, ``"Matrix (math)" → "matrix"``.
    Reference: utils/dictionary.py:141-147 / modules/EntityManager.py:51-57
    (get_mention), which cut the title at the subtitle parenthesis; lowering
    mirrors mention lower-casing at extract_mention_anchors.py:41.
    """
    c = F.col(title) if isinstance(title, str) else title
    return F.lower(F.trim(F.regexp_replace(c, _PARENTHETICAL, "")))


def normalize_uri(uri: Column | str) -> Column:
    """Baidu/wiki URL normalization.

    Strips a ``?fromtitle=...`` query (dictionary.py:48-55), strips
    percent-encoded curly quotes ``%E2%80%9C…%E2%80%9D`` around the title
    segment (dictionary.py:86-90), lower-cases (dictionary.py:87,96,126).
    """
    c = F.col(uri) if isinstance(uri, str) else uri
    c = F.regexp_replace(c, r"\?fromtitle=[^&]*.*$", "")
    c = F.regexp_replace(c, r"%E2%80%9C|%E2%80%9D", "")
    return F.lower(F.trim(c))


def strip_zh_spaces(text: Column | str) -> Column:
    """Remove a single space between two non-ASCII-letter chars.

    Reference: ``re.sub(r'([^a-zA-Z])( )([^a-zA-Z])', r'\\1\\3')`` —
    calculate_entity_embedding.py:94, extract_embedding_train.py:40.
    Applied twice because overlapping matches ("中 文 字") need a second pass,
    same as repeated scans in the reference loop.
    """
    c = F.col(text) if isinstance(text, str) else text
    once = F.regexp_replace(c, r"([^a-zA-Z]) ([^a-zA-Z])", "$1$2")
    return F.regexp_replace(once, r"([^a-zA-Z]) ([^a-zA-Z])", "$1$2")


def strip_punct(text: Column | str) -> Column:
    """Strip the reference's zh+en punctuation set (tools.py:29-52)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, PUNCT_PATTERN, " ")


def tokenize_ws(text: Column | str) -> Column:
    """Whitespace tokenization (en path of WordParser.py:81-83).

    Returns array<string> with empty tokens removed.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def tokens_lower(text: Column | str) -> Column:
    """Lower-cased whitespace tokens — the unit of the dictionary build."""
    c = F.col(text) if isinstance(text, str) else text
    return tokenize_ws(F.lower(c))


def tokens_lower_cjk(text: Column | str) -> Column:
    """CJK-aware lower-cased tokens as a PURE expression: each CJK char is
    its own token, non-CJK word runs stay whole — the same degradation as
    C7's jieba-less fallback (make_tokenize_zh_udf), but JVM-side so the
    context-word path stays inside codegen. zh context words then hit a
    char/word-keyed embedding table instead of matching nothing.
    """
    c = F.col(text) if isinstance(text, str) else text
    # (?U): Java \s is ASCII-only by default; Unicode mode matches the
    # Python scanner's tokenization (NBSP, ideographic space)
    return F.regexp_extract_all(F.lower(c), F.lit(r"(?U)[一-鿿]|[^\s一-鿿]+"), 0)


def make_tokenize_zh_udf():
    """C7: zh word segmentation as an Arrow-batched pandas UDF.

    Reference: WordParser.py:76-79 lazy-loads jieba per process. jieba is
    optional in this environment — when absent, the fallback segments CJK
    runs into single characters and keeps ASCII word runs whole (a standard
    degradation: char-unigram zh tokens are what the reference's freq scan
    effectively counts for single-char dictionary surfaces anyway).
    """
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    cjk_or_word = re.compile(r"[一-鿿]|[A-Za-z0-9_]+")

    def tokenize_zh(texts):
        try:
            import jieba  # noqa: PLC0415

            cut = lambda t: [w for w in jieba.cut(t) if w.strip()]  # noqa: E731
        except ImportError:
            cut = lambda t: cjk_or_word.findall(t)  # noqa: E731
        return texts.map(lambda t: cut(t) if t else [])

    # set REAL (non-stringified) annotations: this module uses
    # `from __future__ import annotations`, which would otherwise leave
    # pyspark's type-hint inference with unevaluated strings
    tokenize_zh.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(tokenize_zh, ArrayType(StringType()))
