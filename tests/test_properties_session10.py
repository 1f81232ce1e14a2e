"""Property-based tests (hypothesis) for the session-10 kernels —
randomized invariants the oracle fixtures can't cover."""

import math

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


class TestMojibakeProperties:
    @given(st.text(alphabet="abcdef ghij.,!?0123456789", max_size=60))
    @settings(deadline=None)
    def test_ascii_is_identity(self, s):
        from ocr_pipeline_ray.stages.normalize import fix_mojibake_fn

        batch = pa.table({"doc_id": pa.array([0], pa.int64()),
                          "text": pa.array([s], pa.string())})
        assert fix_mojibake_fn(batch).column(
            "text_fixed")[0].as_py() == s

    @given(st.lists(
        st.sampled_from(list("éèäöüñçáóúß’‘“–—…«»°")),
        min_size=1, max_size=20))
    @settings(deadline=None)
    def test_corruption_roundtrip_repairs(self, chars):
        """utf8→cp1252 corruption of any target-char string is fully
        repaired (the defining property of the computed table)."""
        from ocr_pipeline_ray.stages.normalize import fix_mojibake_fn

        clean = "x " + "".join(chars) + " y"
        dirty = clean.encode("utf-8").decode("cp1252")
        batch = pa.table({"doc_id": pa.array([0], pa.int64()),
                          "text": pa.array([dirty], pa.string())})
        assert fix_mojibake_fn(batch).column(
            "text_fixed")[0].as_py() == clean


class TestScriptMixProperties:
    @given(st.lists(st.text(
        alphabet="aZ5я.€ ", max_size=12), min_size=1, max_size=6))
    def test_counts_partition_codepoints(self, texts):
        """latin + cyrillic + digit + other == total codepoints, for
        every doc — the 4-way partition is exhaustive and disjoint."""
        from ocr_pipeline_ray.stages.textstats import script_mix_fn

        batch = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        out = script_mix_fn(batch).to_pandas()
        totals = (out["n_latin"] + out["n_cyrillic"]
                  + out["n_digit"] + out["n_other"])
        assert totals.tolist() == [len(t) for t in texts]


class TestBurstPredicateProperties:
    @given(st.lists(st.integers(min_value=0, max_value=10_000),
                    min_size=2, max_size=40))
    @settings(max_examples=200)
    def test_integer_predicate_matches_float_z_test(self, counts):
        """(c·H−S)² > 4(H·S2−S²) with c·H−S>0  ⇔  z > 2 (float),
        away from exact-boundary ties (where float is untrustworthy
        and the integer form is the ground truth)."""
        H = len(counts)
        S = sum(counts)
        S2 = sum(c * c for c in counts)
        var_h2 = H * S2 - S * S
        mean = S / H
        sigma = math.sqrt(max(var_h2, 0)) / H
        for c in counts:
            lhs = c * H - S
            int_burst = lhs > 0 and lhs * lhs > 4 * var_h2
            if sigma == 0:
                assert not int_burst or lhs > 0 and var_h2 == 0 and \
                    lhs * lhs > 0
                continue
            z = (c - mean) / sigma
            # compare away from the boundary: |z−2| tiny means the
            # float test itself is ill-conditioned
            if abs(z - 2.0) > 1e-9:
                assert int_burst == (z > 2.0), (counts, c, z)


class TestCalibrationProperties:
    @given(rows=st.lists(st.tuples(
        st.integers(min_value=-500, max_value=500), st.booleans()),
        min_size=1, max_size=60))
    @settings(max_examples=10, deadline=None, suppress_health_check=[
        HealthCheck.function_scoped_fixture])
    def test_bins_partition_rows(self, rows, ray_session):
        from ocr_pipeline_ray.stages.profile import score_calibration

        import ray.data

        tbl = pa.table({
            "logit": pa.array([r[0] for r in rows], pa.int64()),
            "label_true": pa.array([r[1] for r in rows]),
        })
        out = score_calibration(
            ray.data.from_arrow(tbl), width=32).to_pandas()
        assert out["n_docs"].sum() == len(rows)
        assert out["n_pos"].sum() == sum(r[1] for r in rows)
        assert out["sum_score"].sum() == sum(r[0] for r in rows)
        # every row's floor-div bin is present
        assert set(r[0] // 32 for r in rows) == set(out["bin"])
