"""Utility tests: StepTimer, AverageMeter, logging setup."""
import time

from facl_tpu.utils import AverageMeter, StepTimer, setup_logging


def test_average_meter():
    m = AverageMeter("acc")
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.count == 3
    assert m.avg == (1.0 * 2 + 4.0) / 3
    assert "acc" in str(m)
    m.reset()
    assert m.count == 0 and m.avg == 0.0


def test_step_timer():
    t = StepTimer(clips_per_step=64, warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    assert len(t.times) == 4
    assert len(t.steady_times) == 3
    assert t.mean_step_seconds >= 0.009
    assert t.clips_per_sec() > 0


def test_setup_logging(tmp_path):
    import logging
    logfile = str(tmp_path / "x.log")
    setup_logging(logfile=logfile)
    logging.getLogger("t").info("hello-e2e")
    for h in logging.getLogger().handlers:
        h.flush()
    assert "hello-e2e" in open(logfile).read()
