"""CLI smoke tests — the reference's CLI entry points recast
(relate/export/diff, ref src/main.rs:695-803 self-referential tests)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from gossiphs_spark.datagen import pages_df


@pytest.fixture(scope="module")
def corpus_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    pages, evidence, _ = pages_df(spark, n_pages=30, seed=21)
    pages_dir = str(base / "pages")
    ev_dir = str(base / "evidence")
    half_dir = str(base / "pages_half")
    pages.write.parquet(pages_dir)
    evidence.write.parquet(ev_dir)
    pages.limit(15).write.parquet(half_dir)
    return pages_dir, ev_dir, half_dir


def run_cli(*argv):
    return subprocess.run(
        [sys.executable, "-m", "gossiphs_spark.cli", *argv],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )


def test_relate_outputs_json(corpus_dirs):
    pages_dir, ev_dir, _ = corpus_dirs
    r = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                "relate", "--ignore-zero")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert lines and all(l["score"] > 0 for l in lines)


def test_interactive_repl_two_rounds(corpus_dirs):
    """`interactive` analog (ref src/main.rs:443-478): the graph builds
    ONCE, then each stdin line answers with a {name, related} JSON
    object; EOF exits cleanly. Two prompt rounds, answers cross-checked
    against the one-shot `relate` output for the same urls."""
    pages_dir, ev_dir, _ = corpus_dirs
    want = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                   "relate")
    by_page: dict[str, list] = {}
    for l in want.stdout.splitlines():
        if l.startswith("{"):
            d = json.loads(l)
            by_page.setdefault(d["page"], []).append(d)
    urls = sorted(u for u, rows in by_page.items() if len(rows) >= 2)[:2]
    assert len(urls) == 2

    r = subprocess.run(
        [sys.executable, "-m", "gossiphs_spark.cli",
         "--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
         "interactive", "--top-k", "3"],
        input="\n".join(urls) + "\n",
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert [d["name"] for d in out] == urls
    for d in out:
        assert 0 < len(d["related"]) <= 3
        want_top = sorted(by_page[d["name"]],
                          key=lambda x: (-x["score"], x["other"]))[:3]
        assert [(x["name"], x["score"]) for x in d["related"]] == [
            (x["other"], x["score"]) for x in want_top]

    dry = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                  "interactive", "--dry")
    assert dry.returncode == 0, dry.stderr[-2000:]
    assert json.loads(dry.stdout.strip().splitlines()[-1])["dry"] is True


def test_export_and_diff(corpus_dirs, tmp_path):
    pages_dir, ev_dir, half_dir = corpus_dirs
    out = str(tmp_path / "export")
    r = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                "export", "--out", out, "--format", "parquet")
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["nodes"] > 0 and stats["edges"] > 0

    r2 = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                 "diff", "--old-pages", half_dir)
    assert r2.returncode == 0, r2.stderr[-2000:]
    full = [json.loads(l) for l in r2.stdout.splitlines() if l.startswith("{")]
    states = {l["state"] for l in full}
    assert "ADDED" in states

    # change-list scoping (ref src/main.rs:582-603): the scoped diff must
    # equal the full diff restricted to the listed pages
    scoped_pages = sorted({l["page"] for l in full})[:2]
    r3 = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                 "diff", "--old-pages", half_dir,
                 "--urls", ",".join(scoped_pages))
    assert r3.returncode == 0, r3.stderr[-2000:]
    scoped = [json.loads(l) for l in r3.stdout.splitlines() if l.startswith("{")]
    expected = [l for l in full if l["page"] in set(scoped_pages)]
    key = lambda l: (l["state"], l["page"], l["other"])  # noqa: E731
    assert sorted(scoped, key=key) == sorted(expected, key=key)
    assert 0 < len(scoped) < len(full)

    # an EMPTY provided change list means "nothing changed" → empty diff,
    # never "diff the whole corpus" (regression: falsy-list check)
    empty_list = tmp_path / "changed.txt"
    empty_list.write_text("\n")
    r4 = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                 "diff", "--old-pages", half_dir,
                 "--changed-list", str(empty_list))
    assert r4.returncode == 0, r4.stderr[-2000:]
    assert not [l for l in r4.stdout.splitlines() if l.startswith("{")]


def test_relate_file_max_links_caps_output(corpus_dirs):
    """--file-max-links must cap the related fan-out through the CLI (the
    W4 knob was silently dead in r1 — this pins the wiring end to end)."""
    pages_dir, ev_dir, _ = corpus_dirs
    r = run_cli("--pages", pages_dir, "--evidence", ev_dir, "--cores", "4",
                "--file-max-links", "1", "relate")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert lines
    from collections import Counter
    per_page = Counter(l["page"] for l in lines)
    assert max(per_page.values()) == 1


def test_spark_submit_py_files(tmp_path):
    """North-rule launch mode, for real: the package ships ONLY via
    ``spark-submit --py-files <zip>`` — the child runs from an empty cwd
    with no repo on PYTHONPATH, so a passing run proves the zip carries
    everything the driver and executors import."""
    import os
    import shutil

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("no spark-submit on PATH/SPARK_HOME")

    from gossiphs_spark.session import _package_zip

    out = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", _package_zip(),
            "/root/repo/scripts/submit_job.py",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out, "--job", "related",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["job"] == "related" and stats["rows"] > 0
