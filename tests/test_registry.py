"""Registry hygiene: the queries()/oracle_sql() mapping in
__spark_entry__.py is the driver's correctness contract — lint it.

ADVICE r10: 19 key literals appeared twice in the queries() dict
source; dict construction silently collapses duplicates (last one
wins), which misdocuments window placement and can silently swap a
query's implementation if anyone edits the stale occurrence. These
tests make a duplicate literal a hard failure, and pin the
source-literal count to the runtime registry so the two can't drift.
"""

import ast
import os
import sys
from collections import Counter

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry  # noqa: E402
from bench import _registry_key_literals  # noqa: E402


def _dict_key_literals(func_name: str) -> list:
    src = open(os.path.join(HERE, "__spark_entry__.py")).read()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            # Anchor to the RETURNED dict, mirroring bench.py (ADVICE
            # r11: an earlier helper dict literal would shadow it).
            for n in ast.walk(node):
                if isinstance(n, ast.Return) and isinstance(n.value, ast.Dict):
                    return [
                        k.value
                        for k in n.value.keys
                        if isinstance(k, ast.Constant)
                    ]
    raise AssertionError(f"{func_name}() returned dict literal not found")


def test_queries_has_no_duplicate_key_literals():
    lits = _dict_key_literals("queries")
    dup = sorted(k for k, v in Counter(lits).items() if v > 1)
    assert not dup, f"duplicate queries() key literals: {dup}"


def test_queries_literal_count_matches_runtime_registry():
    assert len(_dict_key_literals("queries")) == len(entry.queries())


def test_bench_registry_helper_agrees():
    # bench.py's independent tally is the same ast scan — keep them
    # honest against each other so the bench-time assert can't rot
    assert _registry_key_literals() == _dict_key_literals("queries")


def test_oracle_sql_has_no_duplicate_key_literals():
    lits = _dict_key_literals("oracle_sql")
    dup = sorted(k for k, v in Counter(lits).items() if v > 1)
    assert not dup, f"duplicate oracle_sql() key literals: {dup}"


def test_oracle_keys_are_registered_queries():
    qs = set(entry.queries())
    osql = entry.oracle_sql()
    assert set(osql) <= qs
    # the rows-only remainder is a declared, finite list — additions
    # to it should be deliberate (each needs a stat gate), so pin it
    rows_only = sorted(qs - set(osql))
    assert rows_only == sorted(
        [
            "ann_cosine_topk_lsh",
            # reduce-then-search over the rows-only PCA fit; recall@5 +
            # MRR vs the full-dim exact top-k stat-gated per round
            "ann_cosine_topk_pca",
            "bpe_merges",
            "bpe_token_count",
            "dp_noise",
            "hll_user_rollup",
            # eigendecomposition has no SQL twin; pinned by the
            # numpy-twin + repartition-invariance tests
            "pca_project",
            "kmeans_embeddings",
            "model_utility",
            "quality_classifier",
            "synthetic_sample",
            "zlib_ratio",
            "ann_cosine_topk_ivf",
        ]
    ), f"rows-only set changed: {rows_only}"


def test_bench_stdout_line_fits_driver_capture():
    """The driver records only the LAST 2000 bytes of bench.py stdout;
    simulate the stdout-line construction with worst-case timings
    (1000.0s per query — widest plausible float rendering) and assert
    the line parses and fits the budget."""
    import json

    names = list(entry.queries())
    timings = {k: 1000.123 for k in names}
    total = round(sum(timings.values()), 3)
    base = {
        "metric": "safedata-pipeline-spark headline queries, total wall sec",
        "value": total,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(names),
        "queries": {},
        "queries_omitted": len(names),
        "queries_full": "BENCH_local.json",
        "reps": 3,
        "wall_sec": 99999.9,
        "loadavg": [99.99, 99.99, 99.99],
    }
    by_cost = sorted(timings, key=lambda k: -timings[k])
    line = json.dumps(base)
    for name in by_cost:
        base["queries"][name] = timings[name]
        base["queries_omitted"] = len(names) - len(base["queries"])
        cand = json.dumps(base)
        if len(cand) + 1 > 1900:
            break
        line = cand
    assert len(line) + 1 <= 1900
    parsed = json.loads(line)
    assert parsed["value"] == total and parsed["n_queries"] == len(names)
    assert parsed["queries"]  # at least some per-query medians survive


def test_survey_and_readme_header_counts_match_registry():
    # VERDICT r11 Missing #3: header prose went stale ("206/195" vs an
    # actual 211/200). tools/annotate_survey.py now rewrites the count
    # phrases from the registry; this lint asserts they match at HEAD.
    n = len(entry.queries())
    m = len(entry.oracle_sql())
    survey = open(os.path.join(HERE, "SURVEY.md")).read()
    readme = open(os.path.join(HERE, "README.md")).read()
    assert f"{n} registered, {m} oracle-backed" in survey
    assert f"{n} registered queries ({m} hash-checked" in readme
    assert f"{n} named\n`queries()`, and {m} matching" in readme


def test_survey_extension_table_rows_are_sorted():
    import re as _re

    row = _re.compile(r"^\| (X\d+) \|")
    nums = [
        int(mm.group(1)[1:])
        for ln in open(os.path.join(HERE, "SURVEY.md"))
        if (mm := row.match(ln))
    ]
    assert nums == sorted(nums), "SURVEY.md X-rows out of numeric order"
