"""CLI parity with the reference's bin/job_history flags."""

from hadoop_jobanalyzer_spark.__main__ import build_parser, main


def test_cli_map_table_golden(capsys, fixture_log1, spark):
    assert main(["-m", "-i", fixture_log1, "-d", " "]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 512
    # golden row from vis/grap/map.d (same space-delimited format)
    assert out[0] == "task_201010291643_0125_m_000000 1289542284 1289551128 8843 1"


def test_cli_summary(capsys, fixture_log1, spark):
    assert main(["-s", "-i", fixture_log1]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    fields = out[0].split(", ")
    assert fields[0] == "job_201010291643_0125"
    assert "9450.6328125" in fields  # avg map len (README:26)


def test_cli_timeline_default_mode(capsys, fixture_log2, spark):
    assert main(["-i", fixture_log2]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    # t=0..range inclusive rows, 6 columns each
    assert len(out) > 30000
    assert all(len(line.split(", ")) == 6 for line in out[:100])


def test_cli_mutually_exclusive_modes():
    parser = build_parser()
    try:
        parser.parse_args(["-s", "-m"])
        raised = False
    except SystemExit:
        raised = True
    assert raised
