"""Session-10 operators: rate bursts, calibration, script mix."""

import numpy as np
import pyarrow as pa


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


class TestRateBursts:
    def _events(self, hours_by_type):
        """hours_by_type: {type: [count for hour0, hour1, ...]} —
        expand into one row per event at the given hour."""
        types, ts = [], []
        base = np.datetime64("2024-01-01T00:00:00", "us")
        hour = np.timedelta64(3600, "s").astype("timedelta64[us]")
        for t, counts in hours_by_type.items():
            for h, c in enumerate(counts):
                for _ in range(c):
                    types.append(t)
                    ts.append(base + h * hour)
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        })

    def test_burst_detected_above_2_sigma(self, ray_session):
        from ocr_pipeline_ray.stages.temporal import rate_bursts

        # 11 quiet hours at 2/hour, one storm hour at 30: mean≈4.3,
        # σ≈7.7 → 30 is > mean + 2σ; 2 is not.
        tbl = self._events({"click": [2] * 11 + [30]})
        out = rate_bursts(_ds(tbl)).to_pandas()
        assert out.loc[0, "n_hours"] == 12
        assert out.loc[0, "n_bursts"] == 1
        assert out.loc[0, "max_n"] == 30

    def test_uniform_rate_has_no_bursts(self, ray_session):
        from ocr_pipeline_ray.stages.temporal import rate_bursts

        tbl = self._events({"view": [5] * 8})
        out = rate_bursts(_ds(tbl)).to_pandas()
        # zero variance: c·H − S == 0 for every hour → no burst
        assert out.loc[0, "n_bursts"] == 0

    def test_per_key_baselines_independent(self, ray_session):
        from ocr_pipeline_ray.stages.temporal import rate_bursts

        # 9 would be a huge burst for 'quiet' but is baseline for
        # 'busy' — baselines must not bleed across keys.
        tbl = self._events({
            "quiet": [1] * 11 + [9],
            "busy": [9] * 12,
        })
        out = rate_bursts(_ds(tbl)).to_pandas().set_index("event_type")
        assert out.loc["quiet", "n_bursts"] == 1
        assert out.loc["busy", "n_bursts"] == 0

    def test_block_layout_invariance(self, ray_session):
        from ocr_pipeline_ray.stages.temporal import rate_bursts

        tbl = self._events({"a": [1, 1, 1, 20], "b": [3, 3, 3, 3]})
        one = rate_bursts(_ds(tbl)).to_pandas()
        many = rate_bursts(
            _ds(tbl).repartition(7), n_buckets=3).to_pandas()
        assert one.equals(many)


class TestScoreCalibration:
    def test_bins_and_floor_division(self, ray_session):
        from ocr_pipeline_ray.stages.profile import score_calibration

        tbl = pa.table({
            "logit": pa.array([-17, -1, 0, 15, 16, 33], pa.int64()),
            "label_true": pa.array(
                [False, False, True, True, True, False]),
        })
        out = score_calibration(_ds(tbl), width=16).to_pandas()
        # floor division: -17 → bin -2, -1 → bin -1 (NOT 0), 0..15
        # → bin 0, 16 → bin 1, 33 → bin 2
        assert out["bin"].tolist() == [-2, -1, 0, 1, 2]
        assert out["n_docs"].tolist() == [1, 1, 2, 1, 1]
        assert out["n_pos"].tolist() == [0, 0, 2, 1, 0]
        assert out["sum_score"].tolist() == [-17, -1, 15, 16, 33]

    def test_partials_merge_across_blocks(self, ray_session):
        from ocr_pipeline_ray.stages.profile import score_calibration

        n = 100
        tbl = pa.table({
            "logit": pa.array(list(range(n)), pa.int64()),
            "label_true": pa.array([i % 2 == 0 for i in range(n)]),
        })
        out = score_calibration(
            _ds(tbl).repartition(9), width=25).to_pandas()
        assert out["n_docs"].tolist() == [25, 25, 25, 25]
        assert out["n_pos"].sum() == 50
        assert out["sum_score"].sum() == n * (n - 1) // 2


class TestScriptMix:
    def _run(self, texts):
        from ocr_pipeline_ray.stages.textstats import script_mix_fn

        batch = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        return script_mix_fn(batch).to_pandas()

    def test_pure_and_mixed_scripts(self):
        out = self._run([
            "abc XYZ",          # pure latin + 1 space → other
            "привет",           # pure cyrillic
            "cафé42",           # mixed: latin c, cyrillic а, é=other
        ])
        assert out.loc[0, "n_latin"] == 6
        assert out.loc[0, "n_other"] == 1
        assert not out.loc[0, "mixed"]
        assert out.loc[1, "n_cyrillic"] == 6
        assert not out.loc[1, "mixed"]
        assert out.loc[2, "n_latin"] == 1   # c
        assert out.loc[2, "n_cyrillic"] == 2  # а, ф
        assert out.loc[2, "n_digit"] == 2
        assert out.loc[2, "n_other"] == 1   # é (Latin-1 Supplement)
        assert bool(out.loc[2, "mixed"])

    def test_null_and_empty_kept_with_zeros(self):
        out = self._run([None, "", "ok"])
        assert len(out) == 3
        assert out.loc[0].drop("doc_id").tolist() == [0, 0, 0, 0, False]
        assert out.loc[1, "n_latin"] == 0
        assert out.loc[2, "n_latin"] == 2
