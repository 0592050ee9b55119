"""Checkpoint/resume: training continues bit-exact after reload."""

import numpy as np

from dorylus_tpu.common.config import LayerConfig, TrainConfig
from dorylus_tpu.engine.engine import Engine
from dorylus_tpu.graph.graph import synthetic_graph


def test_resume_continues_exactly(tmp_path):
    g = synthetic_graph(200, 6, 16, 4, seed=31)
    layers = LayerConfig([16, 8, 4])

    # Run 10 epochs straight through.
    cfg_a = TrainConfig(epochs=10, eval_every=0)
    a = Engine(g, layers, cfg_a)
    ra = a.run()

    # Run 5 epochs + checkpoint, then resume for 5 more.
    ckdir = str(tmp_path / "ck")
    cfg_b = TrainConfig(epochs=5, eval_every=0, checkpoint_dir=ckdir,
                        checkpoint_every=5)
    b = Engine(g, layers, cfg_b)
    b.run()
    cfg_c = TrainConfig(epochs=5, eval_every=0, checkpoint_dir=ckdir,
                        resume=True)
    c = Engine(g, layers, cfg_c)
    assert c.start_epoch == 5
    rc = c.run()

    np.testing.assert_allclose(ra.epochs[-1].loss, rc.epochs[-1].loss,
                               rtol=1e-6, atol=1e-8)


def test_resume_ignores_truncated_tmp_and_empty_latest(tmp_path):
    """Round-5 review regressions: (a) a crash mid-save must never leave
    a temp file the resume glob can pick over a complete checkpoint;
    (b) an empty LATEST marker must fall back to the glob instead of
    resolving to the directory itself."""
    import numpy as np

    from dorylus_tpu.engine.checkpoint import (latest_checkpoint,
                                               load_checkpoint,
                                               save_checkpoint)

    d = tmp_path / "ck"
    params = {"w0": np.ones((2, 2), np.float32)}
    save_checkpoint(d, 10, params)
    # Simulated crash artifacts: a garbage dotfile temp (current naming)
    # AND a legacy-named truncated temp that the old glob matched.
    (d / ".ckpt_00000020.npz.tmp").write_bytes(b"garbage")
    (d / "ckpt_00000020.tmp.npz").write_bytes(b"garbage")
    p = latest_checkpoint(d)
    assert p is not None and p.name == "ckpt_00000010.npz"
    assert load_checkpoint(p)["step"] == 10

    (d / "LATEST").write_text("")  # crash mid-marker-write
    p = latest_checkpoint(d)
    assert p is not None and p.name == "ckpt_00000010.npz"


def test_target_acc_zero_disables_early_stop():
    """--target-acc 0 must match the reference's targetAcc=0 'disabled'
    semantics (tryEarlyStop never upgrades), not stop at the first eval."""
    from dorylus_tpu.engine.convergence import ConvergeMonitor, ConvergeState

    m = ConvergeMonitor(0.0)
    assert m.update(0.5) == ConvergeState.EARLY
    assert not m.done
    m2 = ConvergeMonitor(0.4)
    assert m2.update(0.5) == ConvergeState.DONE


def test_avg_epoch_ms_skips_first_group():
    """Engines smear the first group's compile across all k of its
    records (identical time_ms); avg_epoch_ms must drop the whole run of
    them, not just record 0."""
    from dorylus_tpu.common.metrics import EpochRecord, RunReport

    r = RunReport()
    for i in range(5):
        r.add_epoch(EpochRecord(i, 1000.0))  # first compiled group (k=5)
    for i in range(5, 10):
        r.add_epoch(EpochRecord(i, 10.0))    # warm group
    assert r.avg_epoch_ms == 10.0
    # Single-group run keeps the old drop-first behavior.
    r2 = RunReport()
    for i in range(3):
        r2.add_epoch(EpochRecord(i, 7.0))
    assert r2.avg_epoch_ms == 7.0
