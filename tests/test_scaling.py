"""Scaling harness smoke test on the virtual CPU mesh."""

from cubicsdr_tpu.parallel.scaling import measure_scaling


def test_scaling_harness_runs():
    rep = measure_scaling(sample_rate=1_000_000, num_channels=8,
                          demods_per_chip=2, device_counts=[1, 2],
                          per_shard_len=None, n_iters=2, warmup=1)
    rows = rep["rows"]
    assert [r["devices"] for r in rows] == [1, 2]
    assert all(r["msps"] > 0 for r in rows)
    assert rows[0]["efficiency"] == 1.0
