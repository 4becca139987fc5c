"""Training moves the north-star metric (VERDICT r2 next #5).

The reference's only quality signal during training is the BEIR eval
hook (/root/reference/train.py:329-341 ->
/root/reference/src/beir_utils.py:196-245). This ties OUR trainer to
that metric in-env: a synthetic fit-eval-style topical dataset
(tools/train_ndcg_curve.py) where a random-init encoder starts well
below ceiling, then a short real training run must lift NDCG@10 by a
wide margin. Chip-gated (the CPU copy would take ~an hour); the full
1k-step curve lives in docs/PERF.md.
"""

import json
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real chip (a CPU run takes ~1h)")
class TestTrainingLiftsNdcg:
    def test_trained_beats_untrained_ndcg(self, tmp_path):
        from train_ndcg_curve import run

        steps = 300
        result = run(
            str(tmp_path), steps=steps, eval_freq=steps, batch=64,
            synth_kw=dict(n_topics=20, eval_docs_per_topic=20,
                          n_queries=40, train_tokens=2_000_000,
                          topic_frac=0.3),
        )
        curve = {r["step"]: r for r in result["curve"]}
        assert 0 in curve and steps in curve, curve.keys()
        start, end = curve[0]["NDCG@10"], curve[steps]["NDCG@10"]
        # margin wide enough that noise can't pass: random-init sits
        # around 25-55 on this config, a trained encoder above 85
        assert end > start + 20, (start, end)
        assert end > 80, (start, end)
        assert curve[steps]["Recall@100"] > curve[0]["Recall@100"], curve
        # artifacts for the log
        print(json.dumps(result["curve"]))
