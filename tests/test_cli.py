"""CLI surface tests (run in-process so the CPU-forced conftest applies)."""

import json

from dorylus_tpu.cli import main


def test_train_synthetic(capsys):
    rc = main(["train", "--dataset", "synthetic", "--epochs", "5",
               "--eval-every", "5", "--synth-vertices", "300",
               "--synth-degree", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "final val accuracy" in out


def test_train_sharded(capsys):
    rc = main(["train", "--dataset", "synthetic", "--epochs", "3",
               "--eval-every", "0", "--shards", "4",
               "--synth-vertices", "200", "--synth-degree", "4"])
    assert rc == 0


def test_prepare_and_train_from_dir(tmp_path, capsys):
    (tmp_path / "edges.txt").write_text(
        "\n".join(f"{i} {(i + 1) % 40}" for i in range(40)))
    (tmp_path / "feats.txt").write_text(
        "\n".join("1 0 1 0" for _ in range(40)))
    (tmp_path / "labels.txt").write_text(
        "\n".join(str(i % 3) for i in range(40)))
    rc = main(["prepare-data", "--edges", str(tmp_path / "edges.txt"),
               "--features", str(tmp_path / "feats.txt"),
               "--labels", str(tmp_path / "labels.txt"),
               "--out", str(tmp_path / "ds"), "--feature-dim", "4",
               "--classes", "3"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["vertices"] == 40

    rc = main(["train", "--data-dir", str(tmp_path / "ds"), "--epochs", "3",
               "--eval-every", "0"])
    assert rc == 0


def test_train_checkpoint_then_infer(tmp_path, capsys):
    """Train with checkpoints, then the `infer` command (the reference's
    inference-only forward variant, funcs/dnnl-forward-gcn) must dump
    per-vertex outputs from the latest checkpoint."""
    import numpy as np

    from dorylus_tpu.graph.dataio import save_dataset
    from dorylus_tpu.graph.graph import synthetic_graph

    data = tmp_path / "data"
    data.mkdir()
    save_dataset(data, synthetic_graph(120, 5, 8, 4, seed=6))
    (tmp_path / "l.config").write_text("8\n6\n4\n")
    ck = tmp_path / "ck"
    rc = main(["train", "--data-dir", str(data), "--config",
               str(tmp_path / "l.config"), "--epochs", "4",
               "--eval-every", "0", "--checkpoint-dir", str(ck),
               "--checkpoint-every", "2"])
    assert rc == 0
    out = tmp_path / "preds.txt"
    rc = main(["infer", "--data-dir", str(data), "--config",
               str(tmp_path / "l.config"), "--checkpoint-dir", str(ck),
               "--out", str(out), "--softmax"])
    assert rc == 0
    preds = np.loadtxt(out)
    assert preds.shape == (120, 4)
    np.testing.assert_allclose(preds.sum(1), 1.0, atol=1e-4)
