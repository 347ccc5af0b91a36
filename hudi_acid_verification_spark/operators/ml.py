"""Model-serving operators: tree-ensemble inference as pure codegen.

The reference harness has no ML surface (it is an ACID verifier —
hudi-acid-verification/src/main/java, SURVEY.md §4); these operators cover
the model-gate stage every large-scale training-data pipeline runs after
the rule-based filters: a trained classifier scores every document and the
pipeline keeps/drops/buckets on the margin.

Design rule: a decision-tree ensemble is served as nested CASE expressions
— no UDF, no broadcast, no state. Catalyst compiles the cascade into
whole-stage-codegen branches, so inference costs ONE corpus scan at exactly
the scan's throughput; this is how XGBoost/LightGBM models are actually
productionized in SQL engines when latency matters. Features and leaf
margins are integers, so the served score is bit-identical across engines
(the DuckDB oracle runs the same cascade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query

# A pseudo-trained 3-tree GBDT over integer document features. Thresholds
# are plausible corpus statistics; leaf values are integer margins scaled
# by 100 (a real training run would emit floats — scaled ints serve the
# same decision boundary and stay exact cross-engine). Swapping in real
# trained trees changes these literals, not the plan.
_TREES = [
    # (feature, threshold, feature2, threshold2, leaves LL,LR,RL,RR)
    ("n_tokens", 40, "avg_tok_len_x100", 450, (-120, 35, 35, 90)),
    ("digit_cnt", 6, "n_chars", 250, (60, 25, -15, -80)),
    ("avg_tok_len_x100", 600, "n_tokens", 75, (20, 45, -140, -30)),
]
_BIAS = -10


def _tree_case_sql(feat: str, thr: int, feat2: str, thr2: int, leaves) -> str:
    ll, lr, rl, rr = leaves
    return (
        f"CASE WHEN {feat} < {thr} THEN "
        f"(CASE WHEN {feat2} < {thr2} THEN {ll} ELSE {lr} END) "
        f"ELSE (CASE WHEN {feat2} < {thr2} THEN {rl} ELSE {rr} END) END"
    )


def _ensemble_oracle() -> str:
    score = " + ".join(_tree_case_sql(*t) for t in _TREES)
    return f"""
    WITH feats AS (
        SELECT doc_id,
               n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS digit_cnt,
               CAST((length(replace(text, ' ', '')) * 100)
                   // (length(text) - length(replace(text, ' ', '')) + 1)
                   AS BIGINT) AS avg_tok_len_x100
        FROM documents
    )
    SELECT doc_id, n_tokens, digit_cnt, avg_tok_len_x100,
           CAST({score} + {_BIAS} AS BIGINT) AS margin_x100,
           ({score} + {_BIAS} >= 0) AS keep
    FROM feats
    """


@query("ml_tree_ensemble_score", oracle=_ensemble_oracle())
def ml_tree_ensemble_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GBDT-style quality-gate inference compiled to CASE cascades: three
    depth-2 trees over integer document features (token count, digit
    count, average token length ×100), summed margins plus a bias, and a
    keep/drop decision on the sign — the post-filter model gate of a
    pretraining pipeline, served with zero UDFs.

    Scale shape: the entire ensemble is a single narrow projection —
    no shuffle, no join, no Python. Catalyst folds the feature expressions
    and the nested CASEs into one WholeStageCodegen stage, so a 500-tree
    production ensemble serves at parquet-scan throughput with the same
    plan (trees only widen the generated code, never add an exchange).
    The features derive from exact integer string arithmetic (token count
    = space count + 1 on the single-space-joined fixture text; average
    token length is an integer DIV), so margins are bit-identical to the
    oracle's cascade — the model VALUE, not just its shape, is verified.
    """
    d = load(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
        + F.lit(1)
    )
    digit_cnt = F.length(
        F.regexp_replace(F.col("text"), "[^0-9]", "")
    ).cast("bigint")
    # Integer DIV, not a double divide: DuckDB's `//` and Spark's `DIV`
    # are the same exact integer floor on non-negative operands, where a
    # double quotient could round across the truncation boundary.
    feats = d.select(
        "doc_id",
        F.col("n_chars"),
        n_tokens.alias("n_tokens"),
        digit_cnt.alias("digit_cnt"),
        F.expr(
            "CAST((length(replace(text, ' ', '')) * 100) DIV "
            "(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)"
        ).alias("avg_tok_len_x100"),
    )

    def tree(feat, thr, feat2, thr2, leaves):
        ll, lr, rl, rr = [F.lit(x) for x in leaves]
        left = F.when(F.col(feat2) < thr2, ll).otherwise(lr)
        right = F.when(F.col(feat2) < thr2, rl).otherwise(rr)
        return F.when(F.col(feat) < thr, left).otherwise(right)

    score = sum((tree(*t) for t in _TREES), F.lit(0)) + F.lit(_BIAS)
    return feats.select(
        "doc_id",
        "n_tokens",
        "digit_cnt",
        "avg_tok_len_x100",
        score.cast("bigint").alias("margin_x100"),
        (score >= 0).alias("keep"),
    )
