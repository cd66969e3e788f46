"""Empty/degenerate-input robustness for the round-2 corpus operators —
a filter upstream can legitimately drain any of these to zero rows."""

import pyarrow as pa


def test_webprep_all_pages_gated_out(ray_session):
    import ray.data as rd

    from mdmpublic_ray.pipelines.webprep import run_web_prep

    t = pa.table(
        {
            "page_id": pa.array([1, 2], pa.int64()),
            "raw_text": pa.array(["Short line", "Menu"], pa.string()),
        }
    )
    assert run_web_prep(rd.from_arrow(t)).count() == 0


def test_pack_empty_input(ray_session):
    import ray.data as rd

    from mdmpublic_ray.stages.packing import pack_token_stream

    t = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    assert pack_token_stream(rd.from_arrow(t)).count() == 0


def test_linededup_empty_input(ray_session):
    import ray.data as rd

    from mdmpublic_ray.stages.linededup import dedup_lines

    t = pa.table(
        {"page_id": pa.array([], pa.int64()), "raw_text": pa.array([], pa.string())}
    )
    assert dedup_lines(rd.from_arrow(t)).count() == 0


def test_scrub_empty_text(ray_session):
    from mdmpublic_ray.stages.scrub import drop_boilerplate_batch, redact_pii_batch

    t = pa.table(
        {"page_id": pa.array([7], pa.int64()), "raw_text": pa.array([""], pa.string())}
    )
    bp = drop_boilerplate_batch(t)
    assert bp["n_kept"][0].as_py() == 0 and bp["clean_text"][0].as_py() == ""
    red = redact_pii_batch(t)
    assert red["clean_text"][0].as_py() == ""


def test_write_web_prep_partitioned_layout(ray_session, tmp_path):
    """Split-partitioned parquet output: hive layout per split, partition
    pruning on re-read, and a re-read that matches the written rows."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.pipelines.webprep import run_web_prep, write_web_prep
    from mdmpublic_ray.sources.webtext import read_webpages

    out = str(tmp_path / "prep")
    prepared = run_web_prep(read_webpages())
    counts = write_web_prep(prepared, out)

    dirs = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert dirs and {d.split("=", 1)[1] for d in dirs} == set(counts)
    back = rd.read_parquet(out)
    assert back.count() == sum(counts.values())
    # partition pruning: one split reads only its own rows
    one = sorted(counts)[0]
    only = rd.read_parquet(os.path.join(out, f"split={one}"))
    assert only.count() == counts[one]
