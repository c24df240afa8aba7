"""Static lint for oracle SQL AND plan-function source against the
bit-portability catalog.

The cross-engine reds of rounds 6-9 each traced to one of a small set of
constructs (ARCHITECTURE.md "Bit-portability catalog"): ROUND() on
rational-valued doubles splits on decimal ties (lesson 16), libm
transcendentals differ in last ulps (lesson 18), SUM() over raw doubles
is partition-order-dependent, engine-native hash functions are private,
and volatile functions are nondeterministic by definition.

The empirical gates (parity at three SFs, the layout sweep, dtype audit)
catch these AFTER a query is written; this lint catches them at
write time. It is a RATCHET, not a proof: every query already using a
conditionally-safe construct when the lint was introduced has a green
external verification row and sits in the allowlist below with the
reason its use is sanctioned. A NEW query (or a new construct in an old
query) fails the lint until its use is justified and added here — the
pytest wrapper makes that an explicit, reviewable diff.

Hard-banned constructs (no allowlist): engine-native hashes and
volatile functions — there is no sanctioned use in an oracle.

Usage: python tools/oracle_lint.py   (exit 1 on any violation)
"""

from __future__ import annotations

import re
import sys

# Conditionally-safe constructs -> queries with a sanctioned, verified
# use. ROUND on IRRATIONAL values (sqrt/stddev/corr outputs, raw float
# columns) cannot hit a decimal tie (a dyadic double never equals a
# .xxx5 decimal) — lesson 16 bans it only on quantized-integer
# RATIONALS. q46's LN feeds a ROUND(..., 4)-quantized TF-IDF published
# before lesson 18; its driver row is green because both engines'
# doubles agree to far more than 4 places on these magnitudes —
# grandfathered, and the lesson-18 rational restatement (q183) is the
# pattern for new work. q153's SUM over a double is a share-of-total on
# exact integer counts divided ONCE per row by a broadcast total —
# grandfathered with a green r8 row; new work quantizes first.
ALLOW: dict[str, set[str]] = {
    "round": {
        "q09_quantiles_iqr",
        "q11_summary_stats",
        "q34_embedding_topk",
        "q35_embedding_neardup",
        "q36_ann_srp_bucket",
        "q46_tfidf_topterms",
        "q48_grouped_quantiles",
        "q50_correlation",
        "q66_ivf_ann",
        "q73_kmeans_step",
        "q75_embedding_quantize",
        "q83_blocked_neardup_srp",
        "q145_ann_recall_eval",
        "q164_retrieval_rank_eval",
        "q169_retrieval_ndcg",
        "q171_batch_ann_topk",
        "q176_hard_negative_mining",
    },
    "transcendental": {"q46_tfidf_topterms"},
    "float_sum": {"q153_domain_rank"},
}

# The double-typed columns of the test tables, for the float_sum lint:
# SUM directly over any of these is the lesson-18 non-associative case
# even without an explicit CAST ... AS DOUBLE. Remaining known gap
# (ADVICE r9): a SUM over a double-valued EXPRESSION that neither casts
# nor names a raw double column (e.g. SUM(a/b) over integer columns
# promoted by division) still slips past — the dtype audit and
# three-SF parity remain the empirical backstop for those.
_DOUBLE_COLS = (
    "value|o_totalprice|l_extendedprice|l_discount|l_tax|l_quantity"
    "|c_acctbal|s_acctbal|p_retailprice"
)

PATTERNS: dict[str, re.Pattern[str]] = {
    "round": re.compile(r"\bROUND\s*\(", re.I),
    "transcendental": re.compile(
        r"\b(LN|LOG|LOG2|LOG10|EXP|POW|POWER)\s*\(", re.I
    ),
    "float_sum": re.compile(
        r"\bSUM\s*\(\s*(?:CAST\s*\([^)]*AS\s+DOUBLE"
        rf"|(?:[a-z]\w*\.)?(?:{_DOUBLE_COLS})\s*[)*/+-])",
        re.I,
    ),
}

HARD_BANNED: dict[str, re.Pattern[str]] = {
    "engine_hash": re.compile(r"\b(XXHASH64|HASH)\s*\(", re.I),
    "volatile": re.compile(
        r"\b(RANDOM|NOW|CURRENT_DATE|CURRENT_TIMESTAMP)\s*(\(|\b)", re.I
    ),
}

# Spark-SIDE source lint (same ratchet over the plan functions): the 9
# sanctioned F.round uses all round IRRATIONAL values (sqrt/corr/cosine
# outputs) where a decimal tie is measure-zero — lesson 16's safe case.
# rand()/engine hashes/volatile functions/dropDuplicates are hard-banned
# in plan functions: every sampling design here is md5-derived and
# reproducible, and dropDuplicates keeps an arbitrary row per key under
# AQE layout changes (use a total-order row_number filter instead).
SPARK_ALLOW: dict[str, set[str]] = {
    "round": {
        "q09_quantiles_iqr",
        "q11_summary_stats",
        "q46_tfidf_topterms",
        "q48_grouped_quantiles",
        "q50_correlation",
        "q73_kmeans_step",
        "q75_embedding_quantize",
        "q171_batch_ann_topk",
        "q176_hard_negative_mining",
    },
}

SPARK_PATTERNS: dict[str, re.Pattern[str]] = {
    "round": re.compile(r"\bF\.round\s*\("),
}

SPARK_HARD_BANNED: dict[str, re.Pattern[str]] = {
    # Bare-name forms included (ADVICE r9): `from pyspark.sql.functions
    # import rand` or the snake_case dropDuplicates alias would
    # otherwise evade the ban. Bare `hash(` stays un-matched on purpose
    # (it is Python's builtin); F.hash covers the Spark function.
    "rand": re.compile(r"\b(?:F\.)?randn?\s*\("),
    "engine_hash": re.compile(r"\b(?:F\.(?:xxhash64|hash)|xxhash64)\s*\("),
    "volatile": re.compile(r"\bF\.(current_date|current_timestamp|now)\s*\("),
    "dropdup": re.compile(r"\.(?:dropDuplicates|drop_duplicates)\s*\("),
}


def _plan_body(src: str) -> str:
    """The function BODY only: the @register decorator (description
    prose legitimately mentions rand()/ROUND in 'we do NOT use X'
    wording) and comment text are not code. Naive #-strip — a # inside
    a string literal truncates that scan line, an accepted
    false-negative risk for a ratchet."""
    lines = src.splitlines()
    start = next(
        (i for i, ln in enumerate(lines) if ln.lstrip().startswith("def ")),
        0,
    )
    return "\n".join(re.sub(r"#.*$", "", ln) for ln in lines[start:])


def violations() -> list[str]:
    import inspect  # noqa: PLC0415

    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES  # noqa: PLC0415

    out: list[str] = []
    for name, spec in QUERIES.items():
        oracle = spec.oracle or ""
        for key, pat in HARD_BANNED.items():
            if pat.search(oracle):
                out.append(f"{name}: hard-banned construct [{key}] in oracle")
        for key, pat in PATTERNS.items():
            if pat.search(oracle) and name not in ALLOW.get(key, set()):
                out.append(
                    f"{name}: [{key}] in oracle but not in the sanctioned "
                    "allowlist (tools/oracle_lint.py) — restate per the "
                    "bit-portability catalog or justify and allowlist"
                )
        src = _plan_body(inspect.getsource(spec.spark))
        for key, pat in SPARK_HARD_BANNED.items():
            if pat.search(src):
                out.append(
                    f"{name}: hard-banned construct [{key}] in plan function"
                )
        for key, pat in SPARK_PATTERNS.items():
            if pat.search(src) and name not in SPARK_ALLOW.get(key, set()):
                out.append(
                    f"{name}: [{key}] in plan function but not in the "
                    "sanctioned allowlist (tools/oracle_lint.py)"
                )
    # Allowlist hygiene: entries for queries that no longer use the
    # construct (or no longer exist) should be removed.
    for allow, pats, side in (
        (ALLOW, PATTERNS, "oracle"),
        (SPARK_ALLOW, SPARK_PATTERNS, "plan"),
    ):
        for key, names in allow.items():
            for name in sorted(names):
                spec = QUERIES.get(name)
                text = (
                    None
                    if spec is None
                    else (spec.oracle or "")
                    if side == "oracle"
                    else _plan_body(inspect.getsource(spec.spark))
                )
                if spec is None:
                    out.append(
                        f"{side}-allowlist[{key}] names unknown query {name}"
                    )
                elif not pats[key].search(text):
                    out.append(
                        f"{side}-allowlist[{key}] entry {name} is stale "
                        "(construct no longer present) — remove it"
                    )
    return out


def main() -> int:
    v = violations()
    for line in v:
        print(line)
    print(f"{len(v)} oracle-lint violations")
    return 1 if v else 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    sys.exit(main())
