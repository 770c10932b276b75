"""Docs truth-pass: execute every fenced ```python block in README.md
verbatim, in order, in one shared namespace (VERDICT r3 #10 — the quickstart
previously referenced an undefined ``plate_params``).

The blocks reference ``weights/`` (the reference checkpoints) and
``checkpoints/`` (this repo's committed checkpoints) relative to the cwd;
the test runs in a tmp dir with symlinks to both."""

import os
import pathlib
import re

import pytest

from .conftest import requires_ref

REPO = pathlib.Path(__file__).parent.parent
README = REPO / "README.md"


def readme_python_blocks():
    text = README.read_text()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_readme_has_python_blocks():
    blocks = readme_python_blocks()
    assert len(blocks) >= 2
    # the end-to-end block must define everything it uses (no free vars
    # like the round-3 `plate_params` bug); compile-check each block
    for b in blocks:
        compile(b, "<readme>", "exec")


@requires_ref
@pytest.mark.slow
def test_readme_blocks_execute_verbatim(tmp_path, monkeypatch):
    blocks = readme_python_blocks()
    os.symlink("/root/reference/weights", tmp_path / "weights")
    os.symlink(REPO / "checkpoints", tmp_path / "checkpoints")
    monkeypatch.chdir(tmp_path)
    ns = {}
    for i, block in enumerate(blocks):
        exec(compile(block, f"<README block {i}>", "exec"), ns)
    # quickstart produced an SR batch (LPSR output is grayscale)
    assert tuple(ns["sr"].shape) == (8, 32, 192, 1)
    # end-to-end produced one result list per frame
    assert isinstance(ns["results"], list) and len(ns["results"]) == 1
