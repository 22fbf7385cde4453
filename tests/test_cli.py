"""CLI surface smoke tests (the reference's index.js surface re-expressed;
run in-process against the shared Ray session)."""

from __future__ import annotations

import json
import os

import pytest

from ocds_entity_extract_ray.cli import main


@pytest.fixture(scope="module")
def cli_pages(ray_session, tmp_path_factory):
    from ocds_entity_extract_ray.sources.readers import generate_pages

    out = str(tmp_path_factory.mktemp("cli_pages"))
    generate_pages(out, 200, shard_rows=50)
    return out


def test_cli_parquet_run_and_resume(cli_pages, tmp_path, capsys):
    out = str(tmp_path / "kg")
    assert main(["--pages", cli_pages, "--out", out, "--num-buckets", "16"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["entities"] > 0 and rep["triples"] > 0
    assert os.path.isdir(os.path.join(out, "entities"))
    # second run resumes off the manifests
    assert main(["--pages", cli_pages, "--out", out, "--num-buckets", "16"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2.get("entities_resumed") and rep2["triples"] == rep["triples"]


def test_cli_test_mode_writes_nothing(cli_pages, tmp_path, capsys):
    out = str(tmp_path / "never")
    assert main(["--pages", cli_pages, "--out", out, "-t", "--num-buckets", "16"]) == 0
    printed = capsys.readouterr().out
    assert "Testing complete." in printed
    assert not os.path.exists(out)


def test_cli_ndjson_sink(cli_pages, tmp_path, capsys):
    out = str(tmp_path / "nd")
    assert main(["--pages", cli_pages, "--out", out, "-o", "ndjson", "--num-buckets", "16"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["sink"] == "ndjson" and sum(rep["tables"].values()) > 0
    assert any(f.endswith(".ndjson") for f in os.listdir(out))


def test_cli_resumable(cli_pages, tmp_path, capsys):
    out = str(tmp_path / "res")
    assert main(["--pages", cli_pages, "--out", out, "--resumable", "--num-shards", "2", "--num-buckets", "16"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["shards_computed"] == 2 and rep["entities"] > 0
    assert main(["--pages", cli_pages, "--out", out, "--resumable", "--num-shards", "2", "--num-buckets", "16"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["shards_resumed"] == 2


def test_cli_incremental_mode(cli_pages, tmp_path, capsys):
    """--incremental STORE bootstraps on first run, merges a delta on the
    second, and exports entities+triples both times."""
    import shutil

    files = sorted(f for f in os.listdir(cli_pages) if f.endswith(".parquet"))
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a_dir), os.makedirs(b_dir)
    for i, f in enumerate(files):
        shutil.copy(os.path.join(cli_pages, f), (a_dir if i % 2 else b_dir))

    store, out = str(tmp_path / "store"), str(tmp_path / "kg_inc")
    assert main(["--pages", a_dir, "--out", out, "--incremental", store,
                 "--num-buckets", "8"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mode"] == "init" and rep["entities"] > 0

    assert main(["--pages", b_dir, "--out", out, "--incremental", store,
                 "--num-buckets", "8"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["mode"] == "update" and rep2["touched_buckets"]
    assert rep2["entities"] >= rep["entities"]
    assert os.path.isdir(os.path.join(out, "triples"))
