import numpy as np

from qflux_tpu.parallel import collectives as col


def test_single_process_fastpaths():
    assert col.is_main_process()
    assert col.process_count() == 1
    col.barrier()  # no-op, no crash
    out = col.all_gather_host({"x": np.arange(3.0)})
    assert out["x"].shape == (1, 3)
    t = {"y": np.ones(2)}
    assert col.broadcast_from_main(t) is t
    assert col.mean_across_hosts(2.5) == 2.5


def test_validation_shard_covers_all():
    # single process owns everything
    assert col.shard_validation_samples(5) == [0, 1, 2, 3, 4]
