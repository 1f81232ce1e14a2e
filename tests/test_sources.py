"""JSONL/CSV source adapters: byte-identical pipeline results vs
the native Parquet path on the same corpus."""

import base64
import csv as csv_mod
import io

import pyarrow as pa
import pytest


def _flagship_by_url(ds):
    from ocr_pipeline_ray.pipelines.extraction import build_pipeline

    rows = build_pipeline(ds).take_all()
    return {
        r["url"]: (r["extracted_text"], r["hit_ratio"])
        for r in rows
    }


@pytest.fixture(scope="module")
def pages_tbl():
    from ocr_pipeline_ray.corpus import generate_pages_table

    return generate_pages_table(120, seed=13)


@pytest.fixture(scope="module")
def native_results(ray_session, pages_tbl):
    import ray.data

    return _flagship_by_url(ray.data.from_arrow(pages_tbl))


class TestSourceAdapters:
    def test_jsonl_round_trip_matches_parquet_path(
        self, ray_session, pages_tbl, native_results, tmp_path
    ):
        import ray.data

        from ocr_pipeline_ray.sources import (
            pages_from_jsonl,
            pages_to_jsonl,
        )

        out = str(tmp_path / "jsonl")
        pages_to_jsonl(
            ray.data.from_arrow(pages_tbl).repartition(3), out
        )
        ingested = pages_from_jsonl(out)
        assert ingested.schema().names == [
            "url", "warc_ts", "html", "text", "lang"
        ]
        via_jsonl = _flagship_by_url(ingested)
        assert via_jsonl == native_results

    def test_csv_ingest_matches_parquet_path(
        self, ray_session, pages_tbl, native_results, tmp_path
    ):
        import ray.data

        # write wire-encoded CSV by hand (export format under test is
        # ingestion, not csv writing)
        buf = io.StringIO()
        w = csv_mod.writer(buf)
        w.writerow(["url", "warc_ts", "html_b64", "text", "lang"])
        for row in pages_tbl.to_pylist():
            w.writerow([
                row["url"],
                str(row["warc_ts"]),
                base64.b64encode(row["html"] or b"").decode("ascii"),
                row["text"],
                row["lang"],
            ])
        path = tmp_path / "pages.csv"
        path.write_text(buf.getvalue())

        from ocr_pipeline_ray.sources import pages_from_csv

        ingested = pages_from_csv(str(path))
        via_csv = _flagship_by_url(ingested)
        assert via_csv == native_results

    def test_column_projection(self, ray_session, pages_tbl, tmp_path):
        import ray.data

        from ocr_pipeline_ray.sources import (
            pages_from_jsonl,
            pages_to_jsonl,
        )

        out = str(tmp_path / "jsonl")
        pages_to_jsonl(ray.data.from_arrow(pages_tbl), out)
        ds = pages_from_jsonl(out, columns=["url", "lang"])
        assert ds.schema().names == ["url", "lang"]
        assert ds.count() == pages_tbl.num_rows


class TestWarcAdapter:
    def test_warc_round_trip_matches_parquet_path(
        self, ray_session, pages_tbl, native_results, tmp_path
    ):
        import ray.data

        from ocr_pipeline_ray.sources import (
            pages_from_warc,
            pages_to_warc,
        )

        out = str(tmp_path / "warc")
        pages_to_warc(
            ray.data.from_arrow(pages_tbl).repartition(3), out
        )
        ingested = pages_from_warc(out)
        assert ingested.schema().names == [
            "url", "warc_ts", "html", "text", "lang"
        ]
        # raw WARC carries no pre-extracted text column
        assert all(r["text"] is None
                   for r in ingested.take(5))
        via_warc = _flagship_by_url(ingested)
        assert via_warc == native_results

    def test_columns_round_trip_exactly(self, ray_session, pages_tbl,
                                        tmp_path):
        """url/warc_ts/html/lang survive the WARC wire byte-exactly,
        including µs timestamps and non-UTF-8 html bytes."""
        import ray.data

        from ocr_pipeline_ray.sources import (
            pages_from_warc,
            pages_to_warc,
        )

        out = str(tmp_path / "warc2")
        pages_to_warc(ray.data.from_arrow(pages_tbl), out,
                      compress=False)
        got = {r["url"]: (r["warc_ts"], r["html"], r["lang"])
               for r in pages_from_warc(out).take_all()}
        want = {
            u: (t, h, lg)
            for u, t, h, lg in zip(
                pages_tbl.column("url").to_pylist(),
                pages_tbl.column("warc_ts").to_pylist(),
                pages_tbl.column("html").to_pylist(),
                pages_tbl.column("lang").to_pylist(),
            )
        }
        assert got == want

    def test_parser_edge_cases(self):
        """Bodies containing CRLFCRLF, missing Content-Language,
        non-response records skipped, multi-member gzip."""
        import gzip

        from ocr_pipeline_ray.sources.warc import (
            parse_warc_bytes,
            response_record,
            _maybe_gunzip,
            _warcinfo_record,
        )

        tricky = b"<p>a</p>\r\n\r\n<p>b</p>\x00\xff"
        rec1 = response_record("http://x/1", 1_700_000_000_123_456,
                               tricky, "de")
        rec2 = response_record("http://x/2", 1_700_000_000_000_000,
                               b"<i>c</i>", None)
        raw = _warcinfo_record() + rec1 + rec2
        rows = list(parse_warc_bytes(raw))
        assert rows == [
            ("http://x/1", 1_700_000_000_123_456, tricky, "de"),
            ("http://x/2", 1_700_000_000_000_000, b"<i>c</i>", None),
        ]
        # per-record gzip members concatenated = valid .warc.gz
        multi = (gzip.compress(_warcinfo_record() + rec1, mtime=0)
                 + gzip.compress(rec2, mtime=0))
        assert list(parse_warc_bytes(_maybe_gunzip(multi))) == rows


class TestWetExport:
    def test_wet_round_trip(self, ray_session, pages_tbl, tmp_path):
        """extraction output → WET shards → read back: every
        non-error doc's extracted text survives byte-identically;
        error rows (null text) are excluded by the format."""
        import ray.data

        from ocr_pipeline_ray.pipelines.extraction import build_pipeline
        from ocr_pipeline_ray.sources import (
            extracted_to_wet,
            text_from_wet,
        )

        extracted = build_pipeline(
            ray.data.from_arrow(pages_tbl)).materialize()
        want = {r["url"]: (r["warc_ts"], r["extracted_text"])
                for r in extracted.take_all()
                if r["extracted_text"]}
        out = str(tmp_path / "wet")
        extracted_to_wet(extracted.repartition(3), out)
        got = {r["url"]: (r["warc_ts"], r["text"])
               for r in text_from_wet(out).take_all()}
        assert got == want
        assert len(want) < pages_tbl.num_rows  # error rows dropped

    def test_cli_emit_wet(self, ray_session, pages_tbl, tmp_path):
        import glob as globmod

        import pyarrow.parquet as pq

        from ocr_pipeline_ray.__main__ import main

        src = str(tmp_path / "pages.parquet")
        pq.write_table(pages_tbl, src)
        out = str(tmp_path / "out")
        assert main([src, "-o", out, "--emit-wet"]) == 0
        wet_files = globmod.glob(f"{out}/wet/*.warc.wet.gz")
        assert wet_files

        from ocr_pipeline_ray.sources import text_from_wet

        import duckdb

        n = text_from_wet(wet_files).count()
        # exactly the successful non-empty conversions make it to WET
        n_ok = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out}/pid=*/*.parquet')"
            " WHERE extracted_text IS NOT NULL AND extracted_text <> ''"
        ).fetchone()[0]
        assert n == n_ok and 0 < n < pages_tbl.num_rows
