"""Guard: the two intentional O(n^2)/inverted-index exact baselines
(``cosine_pairs``, ``ngram_jaccard_pairs``) are ORACLE-ONLY — they
exist to pin the production twins' semantics and must never migrate
into a composed pipeline query over an unbounded frame. The production
twins are ``cosine_pairs_bucketed`` and the LSH funnel
(``lsh_candidate_pairs`` -> ``jaccard_verify_pairs``).
"""

import ast
import inspect
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "opentelemetry_collector_contrib_spark"
ENTRY = Path(__file__).resolve().parents[1] / "__spark_entry__.py"

ORACLE_ONLY = {"cosine_pairs", "ngram_jaccard_pairs"}
# the two registered exact-baseline queries ARE the oracle exercise —
# they are allowed (and expected) to call the oracle-only functions
ALLOWED_ENTRY_FUNCS = {"_q_dedup_cosine", "_q_dedup_jaccard"}


def test_oracle_only_marker_present():
    from opentelemetry_collector_contrib_spark.training.dedup import (
        ngram_jaccard_pairs,
    )
    from opentelemetry_collector_contrib_spark.training.similarity import (
        cosine_pairs,
    )

    for fn in (cosine_pairs, ngram_jaccard_pairs):
        assert "# ORACLE-ONLY" in inspect.getdoc(fn)


def _calls_in(tree: ast.AST) -> set[str]:
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name) and f.id in ORACLE_ONLY:
                out.add(f.id)
            if isinstance(f, ast.Attribute) and f.attr in ORACLE_ONLY:
                out.add(f.attr)
    return out


def test_no_registered_query_composes_oracle_only_baselines():
    tree = ast.parse(ENTRY.read_text())
    offenders = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            used = _calls_in(node)
            if used and node.name not in ALLOWED_ENTRY_FUNCS:
                offenders[node.name] = used
    assert not offenders, (
        f"oracle-only baselines composed outside the designated exact "
        f"baseline queries: {offenders}"
    )


def test_no_package_module_composes_oracle_only_baselines():
    defining = {"similarity.py", "dedup.py"}
    offenders = {}
    for path in PKG.rglob("*.py"):
        if path.name in defining and path.parent.name == "training":
            continue
        used = _calls_in(ast.parse(path.read_text()))
        if used:
            offenders[str(path)] = used
    assert not offenders, f"oracle-only baselines called in package: {offenders}"
