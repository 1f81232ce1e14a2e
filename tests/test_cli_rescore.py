"""CLI entry point + post-only rescore pipeline."""

import glob
import os

from ocr_pipeline_ray.__main__ import _collect_inputs, main
from ocr_pipeline_ray.pipelines.rescore import rescore_pipeline


class TestCollectInputs:
    def test_dedup_and_sort(self, small_corpus):
        d = os.path.dirname(small_corpus[0])
        got = _collect_inputs([d, small_corpus[0]])
        assert got == sorted(set(small_corpus))

    def test_comma_list_and_glob(self, small_corpus):
        d = os.path.dirname(small_corpus[0])
        got = _collect_inputs([f"{small_corpus[0]},{small_corpus[1]}"])
        assert got == sorted(small_corpus[:2])
        got = _collect_inputs([os.path.join(d, "pages-*.parquet")])
        assert got == sorted(small_corpus)


class TestCli:
    def test_extract_report_resume(self, ray_session, small_corpus, tmp_path):
        out = str(tmp_path / "out")
        rc = main([*small_corpus, "-o", out, "--report"])
        assert rc == 0
        assert glob.glob(os.path.join(out, "pid=*", "*.parquet"))
        wtrs = glob.glob(os.path.join(out, "*.wtr"))
        assert len(wtrs) == 1
        header = open(wtrs[0], encoding="UTF-8").readline().split(",")
        assert len(header) == 8
        # resume: second run processes nothing
        rc = main([*small_corpus, "-o", out])
        assert rc == 0

    def test_config_driven_run(self, ray_session, small_corpus, tmp_path):
        out = str(tmp_path / "out")
        rc = main([*small_corpus, "-o", out, "-c",
                   os.path.join(os.path.dirname(__file__), "..",
                                "conf", "extract_default.ini")])
        assert rc == 0

    def test_missing_inputs(self, ray_session, tmp_path):
        rc = main(["/nonexistent/dir/x.parquet".replace("x", "*"),
                   "-o", str(tmp_path / "o")])
        assert rc == 2


class TestRescore:
    def test_rescore_matches_original_quality(
        self, ray_session, small_corpus, tmp_path
    ):
        from ocr_pipeline_ray.pipelines.extraction import extraction_pipeline

        out = str(tmp_path / "extracted")
        extraction_pipeline(small_corpus).write_parquet(out)
        rescored = rescore_pipeline(out).take_all()
        original = extraction_pipeline(small_corpus).take_all()
        orig_by_key = {(r["url"], r["warc_ts"]): r for r in original}
        assert len(rescored) == len(original)
        for row in rescored:
            orig = orig_by_key[(row["url"], row["warc_ts"])]
            for key in ("hit_ratio", "n_words", "n_errs", "n_lines_in",
                        "n_wraps", "n_shorts", "n_lines_out"):
                assert row[key] == orig[key], (row["url"], key)

    def test_rescore_cli(self, ray_session, small_corpus, tmp_path):
        from ocr_pipeline_ray.pipelines.extraction import extraction_pipeline

        src = str(tmp_path / "extracted")
        extraction_pipeline(small_corpus).write_parquet(src)
        out = str(tmp_path / "rescored_out")
        rc = main([os.path.join(src, "*.parquet"), "-o", out, "--rescore"])
        assert rc == 0
        assert glob.glob(os.path.join(out, "rescored", "*.parquet"))
        assert glob.glob(os.path.join(out, "*.wtr"))


class TestRescoreIniConfig:
    def test_post_only_ini_chain(self, ray_session, small_corpus, tmp_path):
        """conf/rescore_post.ini drives a post-only chain through the
        step registry (the reference's ocr_config_post.ini mode)."""
        import ray.data

        from ocr_pipeline_ray.config import load_steps_ini
        from ocr_pipeline_ray.pipelines.extraction import (
            build_pipeline,
            extraction_pipeline,
        )

        src = str(tmp_path / "extracted")
        extraction_pipeline(small_corpus).write_parquet(src)
        specs = load_steps_ini(
            os.path.join(os.path.dirname(__file__), "..",
                         "conf", "rescore_post.ini")
        )
        assert [s.type for s in specs] == ["RescoreQuality"]
        ds = ray.data.read_parquet(src)
        rows = build_pipeline(ds, steps=specs).take_all()
        assert rows and all("hit_ratio" in r for r in rows)
