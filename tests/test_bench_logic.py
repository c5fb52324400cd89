"""Pins for bench.py's pure decision logic (no SparkSession needed).

The knn headline's self-defense (VERDICT r8 task 2) must fire on the
recorded pollution signatures and stay quiet on recorded clean
windows — cases below use the actual artifact values where they
exist.
"""

from bench import _knn_retry_needed


def test_retry_fires_on_loaded_section_control():
    # r9's real catch: section controls 0.053/0.027 vs end control
    # 0.016 -> floor 0.016, 0.053 > 3x -> retry (artifact carried
    # 597 qps polluted + 1,689.8 qps retry with 0.016/0.016 controls)
    assert _knn_retry_needed(0.053, 0.027, 0.016, 597.1, 1454.6)


def test_retry_fires_on_r8_signature():
    # r8 driver artifact: headline-section control 0.153 (10x the
    # 0.015 idle floor) — the dip this mechanism was built for
    assert _knn_retry_needed(0.153, 0.02, 0.015, 696.2, 493.8)


def test_retry_fires_on_self_inconsistency_with_clean_controls():
    # plausible controls but the 4,096 batch lost to the 32k batch by
    # 2.4x — a co-tenant landed between the stamp and the measurement
    assert _knn_retry_needed(0.02, 0.022, 0.018, 600.0, 1455.0)


def test_retry_fires_on_r9_driver_window():
    # the r9 driver artifact's exact inputs (VERDICT r9 task 2): knn
    # section controls 0.047/0.043 vs end control 0.018 (2.61x floor)
    # and the 4,096 batch losing to the 32k batch by 11% (881.1 vs
    # 991.7). BOTH pre-r10 triggers (3x, 25% margin) just missed and a
    # moderately polluted 881 qps stood beside a clean same-day 1,690.
    # Must fire now — via the 2.5x multiplier AND the strict
    # small-batch-must-win rule, independently.
    assert _knn_retry_needed(0.047, 0.043, 0.018, 881.1, 991.7)
    # strict inconsistency alone (controls flat and warm)
    assert _knn_retry_needed(0.018, 0.018, 0.018, 881.1, 991.7)
    # 2.5x loaded-window alone (small batch winning)
    assert _knn_retry_needed(0.047, 0.043, 0.018, 1509.2, 991.7)


def test_no_retry_on_clean_windows():
    # flat warm controls, small batch winning: nothing to defend
    assert not _knn_retry_needed(0.017, 0.02, 0.017, 1833.0, 1331.5)
    # controls under 2.5x the floor, small batch winning
    assert not _knn_retry_needed(0.04, 0.02, 0.019, 1509.2, 1331.5)


def test_warmup_heavy_start_fires_and_that_is_accepted():
    # a start control 2.5x+ the warm floor is indistinguishable from
    # early co-tenant load from inside one run (r8's IDLE builder run
    # read 0.055 start / 0.017 end from JVM warm-up alone; r7's clean
    # driver window read 0.049/0.019 = 2.58x), so the policy
    # re-measures: one cheap extra pass, and the record gains a
    # fully-warm reading either way — the artifact carries both and
    # adjudicates itself
    assert _knn_retry_needed(0.055, 0.018, 0.017, 1833.0, 1331.5)
    assert _knn_retry_needed(0.049, 0.02, 0.019, 1509.2, 1331.5)
