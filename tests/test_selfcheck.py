"""Every driver-folded self-check gate must hold (functions/selfcheck.py).

These are the same booleans the driver queries fold into their output
columns (bloom_custkey_members, countmin_suppkey_weights,
tdigest_price_minmax, cpc_distinct_users); a False here means the
corresponding sweep row will hash-mismatch too.
"""

import pytest

from datasketches_rust_spark.functions import selfcheck


@pytest.mark.parametrize(
    "fn",
    [
        selfcheck.bloom_algebra_gates,
        selfcheck.countmin_maintenance_gates,
        selfcheck.tdigest_query_gates,
        selfcheck.cpc_wrapper_gates,
        selfcheck.theta_serde_gates,
        selfcheck.hll_estimator_gates,
        selfcheck.minhash_kernel_gates,
        selfcheck.hash_golden_gates,
    ],
)
def test_all_gates_true(fn):
    gates = fn()
    assert gates, "gate dict must be non-empty"
    bad = {k: v for k, v in gates.items() if v is not True}
    assert not bad, f"{fn.__name__} failed gates: {bad}"


def test_gates_deterministic():
    """Bit-stability across calls — the booleans ride the sweep's
    value hash, so flakiness would show up as phantom mismatches."""
    for fn in (
        selfcheck.bloom_algebra_gates,
        selfcheck.countmin_maintenance_gates,
        selfcheck.tdigest_query_gates,
        selfcheck.cpc_wrapper_gates,
        selfcheck.theta_serde_gates,
        selfcheck.hll_estimator_gates,
        selfcheck.minhash_kernel_gates,
        selfcheck.hash_golden_gates,
    ):
        assert fn() == fn()
