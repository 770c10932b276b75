"""Run-artifact registry tests (the local W&B-semantics substitute,
reference ``yolov5/utils/loggers/wandb/wandb_utils.py``)."""

import json
import os

import numpy as np
import pytest

from lpr_tpu.utils.registry import Run, RunRegistry, dataset_fingerprint


def test_registry_versioning_aliases_lineage(tmp_path):
    reg = RunRegistry(str(tmp_path / "runs"))
    data = tmp_path / "data"
    data.mkdir()
    (data / "a.png").write_bytes(b"x" * 100)

    run = reg.new_run("proj", {"lr": 1e-3}, dataset_dirs=[str(data)])
    assert run.id == "proj/run-0000"
    fp0 = run.manifest["dataset_fingerprint"]
    assert fp0 and len(fp0) == 16

    ck1 = tmp_path / "ck1.npz"
    ck2 = tmp_path / "ck2.npz"
    np.savez(ck1, w=np.zeros(3))
    np.savez(ck2, w=np.ones(3))

    a0 = run.log_artifact(str(ck1), aliases=("latest",), step=1)
    assert a0["version"] == 0
    a1 = run.log_artifact(str(ck2), aliases=("latest", "best"), step=2)
    assert a1["version"] == 1
    # 'latest' moved to v1; v0 lost it
    got = run.artifact("latest")
    assert got["version"] == 1 and got["sha256"] == a1["sha256"]
    arts = run.manifest["artifacts"]
    assert arts[0]["aliases"] == []
    # identical content re-logged: re-aliased, not re-versioned
    a2 = run.log_artifact(str(ck1), aliases=("latest",), step=3)
    assert a2["version"] == 0 and len(run.manifest["artifacts"]) == 2
    assert run.artifact("latest")["version"] == 0
    assert run.artifact("best")["version"] == 1
    run.finish({"psnr": 30.5})

    # reload from disk; resume lineage
    assert reg.resume_checkpoint("proj") == str(ck1)
    child = reg.new_run("proj", {"lr": 1e-4}, dataset_dirs=[str(data)],
                        resume_from=reg.load("proj", "run-0000"))
    assert child.id == "proj/run-0001"
    assert child.manifest["parent"]["run_id"] == "proj/run-0000"
    assert child.manifest["parent"]["checkpoint"] == str(ck1)
    # manifest is valid JSON on disk
    with open(child.path) as f:
        assert json.load(f)["project"] == "proj"

    # fingerprint changes when the dataset changes
    (data / "b.png").write_bytes(b"y" * 50)
    assert dataset_fingerprint([str(data)]) != fp0
    # and is stable otherwise
    assert dataset_fingerprint([str(data)]) == dataset_fingerprint([str(data)])


def test_registry_empty_and_missing(tmp_path):
    reg = RunRegistry(str(tmp_path / "none"))
    assert reg.latest("p") is None
    assert reg.resume_checkpoint("p") is None
    r = reg.new_run("p", {})
    assert r.artifact("latest") is None
    assert r.manifest["dataset_fingerprint"] is None


@pytest.mark.slow
def test_train_lpsr_cli_writes_registry_and_resumes(tmp_path, capsys):
    """End-to-end: the LPSR train CLI opens a run, fingerprints the dataset,
    logs best/last artifacts, and --resume-run warm-starts from the previous
    run's 'latest' checkpoint with parent lineage recorded."""
    from PIL import Image

    rng = np.random.RandomState(0)
    for split in ("tr", "va"):
        for kind in ("hr", "lr"):
            d = tmp_path / split / kind
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(
                    rng.randint(0, 255, (16, 32, 3), np.uint8)).save(
                        d / f"p{i}.png")

    from lpr_tpu.cli.train_lpsr import main

    args = ["--hr-train-dir", str(tmp_path / "tr" / "hr"),
            "--lr-train-dir", str(tmp_path / "tr" / "lr"),
            "--hr-val-dir", str(tmp_path / "va" / "hr"),
            "--lr-val-dir", str(tmp_path / "va" / "lr"),
            "--width", "32", "--height", "16",
            "--batch-size", "2", "--epochs", "1",
            "--ckpt-dir", str(tmp_path / "ck"),
            "--runs-dir", str(tmp_path / "runs")]
    main(args)
    reg = RunRegistry(str(tmp_path / "runs"))
    run0 = reg.latest("lpsr")
    assert run0 is not None and run0.id == "lpsr/run-0000"
    assert run0.manifest["dataset_fingerprint"]
    from lpr_tpu.utils.registry import file_sha256

    assert run0.artifact("latest")["sha256"] == file_sha256(
        str(tmp_path / "ck" / "last_model.npz"))
    # after 1 epoch best==last content-wise: the registry content-dedupes,
    # so 'best' aliases the same version rather than minting a new one
    assert run0.artifact("best")["sha256"] == file_sha256(
        str(tmp_path / "ck" / "best_model.npz"))
    assert "best_psnr" in run0.manifest["summary"]

    main(args + ["--resume-run"])
    out = capsys.readouterr().out
    assert "resumed weights from" in out
    run1 = reg.latest("lpsr")
    assert run1.id == "lpsr/run-0001"
    assert run1.manifest["parent"]["run_id"] == "lpsr/run-0000"
