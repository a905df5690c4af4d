"""Multi-host runtime entry: 2 real processes, distributed BA over the
global mesh, checked against the single-process solver (slow; CPU 'hosts'
via gloo collectives — SURVEY.md §2.4 comm-backend row)."""

import pytest


@pytest.mark.slow
def test_two_process_distributed_ba():
    from velocity_tpu.parallel.launch import selftest_multiprocess

    assert selftest_multiprocess(nprocs=2, devs=2, port=53622)


@pytest.mark.slow
def test_two_process_windowed_ba_2axis():
    """The 2-axis window x point mesh the long-video driver actually uses
    (BASELINE config 5 evidence for the product solver)."""
    from velocity_tpu.parallel.launch import selftest_multiprocess_windowed

    assert selftest_multiprocess_windowed(nprocs=2, devs=2, port=53633)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
