"""CLI ``stream`` subcommand — the ray-job entrypoint wiring.

Semantics of the windowed aggregate itself are covered by the streaming
oracle gates; these tests pin the CLI plumbing: argument handling, the
JSON summary contract, idempotent replay, and checkpoint/resume.
"""
import json

import pytest

from ksql_ray.cli import main
from ksql_ray.fixtures import materialize_fixture_dir

N_TURNS = 3000


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_stream")
    paths = materialize_fixture_dir(str(d / "fix"), n_turns=N_TURNS,
                                    seed=7, n_files=4)
    return d, paths


def _stream(capsys, *argv) -> dict:
    assert main(["stream", *argv]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_stream_with_join(fix, capsys):
    d, paths = fix
    sink = str(d / "sink_join")
    r = _stream(capsys, "--input", paths["transcripts"],
                "--meta", paths["conv_meta"], "--sink", sink,
                "--partitions", "4", "--files-per-epoch", "2")
    assert r["rows_in"] == N_TURNS
    assert r["late_drops"] == 0
    assert r["rows_out"] > 0
    # summary row count matches what a committed-sink re-read sees
    from ksql_ray.streaming.sink import TwoPhaseSink
    tbl = TwoPhaseSink(sink).read_committed()
    assert tbl.num_rows == r["rows_out"]
    assert "user_tier" in tbl.column_names  # join projected the table side


def test_stream_replay_is_idempotent(fix, capsys):
    d, paths = fix
    sink = str(d / "sink_replay")
    r1 = _stream(capsys, "--input", paths["transcripts"], "--sink", sink,
                 "--partitions", "4", "--files-per-epoch", "2")
    r2 = _stream(capsys, "--input", paths["transcripts"], "--sink", sink,
                 "--partitions", "4", "--files-per-epoch", "2")
    assert r2["rows_out"] == r1["rows_out"]  # two-phase sink: no dup rows


def test_stream_checkpoint_resume(fix, capsys):
    d, paths = fix
    sink, ckpt = str(d / "sink_ckpt"), str(d / "ckpt")
    r1 = _stream(capsys, "--input", paths["transcripts"], "--sink", sink,
                 "--partitions", "4", "--files-per-epoch", "2",
                 "--checkpoint-dir", ckpt, "--checkpoint-every", "1")
    r2 = _stream(capsys, "--input", paths["transcripts"], "--sink", sink,
                 "--partitions", "4", "--files-per-epoch", "2",
                 "--checkpoint-dir", ckpt, "--resume")
    assert r2["rows_out"] == r1["rows_out"]
    assert r2["rows_in"] == 0  # every epoch replayed from checkpoint
    assert r2["sec"] < r1["sec"]


def test_stream_no_files_errors(fix, capsys, tmp_path):
    assert main(["stream", "--input", str(tmp_path), "--sink",
                 str(tmp_path / "s")]) == 1


def test_dedup_cli_and_resume(fix, capsys):
    d, paths = fix
    sink, ckpt = str(d / "dsink"), str(d / "dckpt")

    def run(*extra):
        assert main(["dedup", "--input", paths["transcripts"],
                     "--sink", sink, "--partitions", "4",
                     "--files-per-epoch", "2", "--checkpoint-dir", ckpt,
                     *extra]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    r1 = run("--checkpoint-every", "1")
    assert r1["rows_in"] == N_TURNS
    # the fixture has no duplicate texts, so everything passes through
    assert r1["rows_out"] == r1["state_keys"] == N_TURNS
    r2 = run("--resume")
    assert r2["rows_in"] == 0 and r2["rows_out"] == 0
    assert r2["state_keys"] == N_TURNS
    from ksql_ray.streaming.sink import TwoPhaseSink
    assert TwoPhaseSink(sink).read_committed().num_rows == N_TURNS


def test_neardup_cli_and_resume(fix, capsys):
    d, paths = fix
    sink, ckpt = str(d / "nsink"), str(d / "nckpt")

    def run(*extra):
        assert main(["neardup", "--input", paths["transcripts"],
                     "--sink", sink, "--partitions", "4",
                     "--files-per-epoch", "2", "--checkpoint-dir", ckpt,
                     *extra]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    r1 = run("--checkpoint-every", "1")
    assert r1["rows_in"] == N_TURNS
    # templated transcript text: most turns near-dup an earlier one
    assert 0 < r1["rows_out"] < N_TURNS
    r2 = run("--resume")
    assert r2["rows_in"] == 0 and r2["rows_out"] == 0
    assert r2["state_records"] == r1["state_records"]
    from ksql_ray.streaming.sink import TwoPhaseSink
    assert TwoPhaseSink(sink).read_committed().num_rows == r1["rows_out"]


def test_cep_cli_and_resume(fix, capsys):
    d, paths = fix
    sink = str(d / "sink_cep")
    ck = str(d / "ck_cep")
    argv = ["cep", "--input", paths["transcripts"], "--sink", sink,
            "--steps", "u:role=user,t:role=tool,a:role=assistant",
            "--partition-by", "conv_id", "--order-by", "ts",
            "--tiebreak", "turn_idx", "--measures", "turn_idx",
            "--within-us", "3600000000", "--lateness-s", "3600",
            "--partitions", "4", "--files-per-epoch", "2",
            "--checkpoint-dir", ck, "--checkpoint-every", "1"]
    assert main(argv) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows_in"] == N_TURNS and r["late_drops"] == 0
    assert r["matches_out"] > 0
    from ksql_ray.streaming.sink import TwoPhaseSink
    assert TwoPhaseSink(sink).read_committed().num_rows == r["matches_out"]
    # resume replays from the checkpoint cursor: committed epochs skip,
    # output is unchanged (idempotent sink)
    assert main([*argv, "--resume"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["rows_in"] == 0
    assert TwoPhaseSink(sink).read_committed().num_rows == r["matches_out"]


def test_embdedup_cli(fix, capsys, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(200, 8)).astype(np.float32)
    mat[100:120] = mat[0:20] + 0.01 * rng.normal(size=(20, 8)).astype(np.float32)
    d = tmp_path / "emb"
    d.mkdir()
    for i in range(4):
        pq.write_table(pa.table({
            "vec_id": pa.array(np.arange(i * 50, (i + 1) * 50), pa.int64()),
            "embedding": pa.array([list(map(float, r))
                                   for r in mat[i * 50:(i + 1) * 50]],
                                  pa.list_(pa.float32())),
        }), str(d / f"b{i}.parquet"))
    sink = str(tmp_path / "sink")
    argv = ["embdedup", "--input", str(d), "--sink", sink, "--dim", "8",
            "--threshold", "0.99", "--planes", "4", "--tables", "16",
            "--partitions", "2", "--files-per-epoch", "2"]
    assert main(argv) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows_in"] == 200
    assert r["rows_out"] == 180  # the 20 planted copies are suppressed
    # idempotent replay
    assert main(argv) == 0
    from ksql_ray.streaming.sink import TwoPhaseSink
    assert TwoPhaseSink(sink).read_committed().num_rows == 180
