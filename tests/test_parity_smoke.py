"""Fast oracle-parity smoke: one representative query per operator
family, in the DEFAULT test set.  The exhaustive 375-query sweep lives
in test_oracle_parity.py behind the ``slow`` marker (same assertions,
same machinery — this module just narrows the parametrization so the
default run keeps cross-checking every family inside the verification
time budget)."""

import pytest

from tests.test_oracle_parity import (  # noqa: F401  (spark fixture via conftest)
    QUERY_NAMES,
    test_query_matches_oracle as _parity_check,
)

# one per family: relational, window/timeseries, survival, Cox/GLM
# iterative, dedup/linkage, text, streaming (stateless + stateful),
# hypothesis tests, graph, ANN/embedding, sketches, sampling, prefix-sum
SMOKE = [
    "join_size",
    "rolling_corr",
    "kaplan_meier",
    "cox_lrt",
    "glm_lrt2",
    "entity_resolution",
    "unigram_train",
    "stream_match",
    "stream_distinct",
    "bh_fdr",
    "pagerank",
    "ivf_pq_rerank",
    "hll_cardinality",
    "rmst_diff",
]


def test_smoke_names_still_declared():
    missing = [n for n in SMOKE if n not in QUERY_NAMES]
    assert not missing, f"smoke queries no longer declared: {missing}"


@pytest.mark.parametrize("name", SMOKE)
def test_family_representative_matches_oracle(spark, name):
    _parity_check(spark, name)
