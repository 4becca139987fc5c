"""Export a training checkpoint to an HF-loadable model directory
(reference save_contriever, /root/reference/src/contriever.py:162-166:
the encoder is saved in HF format so downstream tools load it with
transformers).

  python -m czechtriever_tpu.cli.export_hf \\
      --checkpoint runs/exp/checkpoint/latest --output_dir export/
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys

import jax
import numpy as np

from czechtriever_tpu.config import Config
from czechtriever_tpu.models import bert, hf_interop
from czechtriever_tpu.training import optim, state as statelib
from czechtriever_tpu.utils import checkpoint as ckpt

logger = logging.getLogger(__name__)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir (…/checkpoint/<name> or latest)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_config_file", default=None,
                   help="HF BertConfig json when the checkpoint config "
                        "lacks architecture info")
    p.add_argument("--vocab_file", default=None,
                   help="vocab.txt to ship alongside the weights")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    cfg = Config.load(os.path.join(args.checkpoint, "config.json"))
    if args.model_config_file:
        import json
        with open(args.model_config_file) as f:
            mcfg = bert.BertConfig.from_hf_dict(json.load(f))
    else:
        from czechtriever_tpu.cli import common
        _, mcfg, _ = common.resolve_model(cfg)

    tx = optim.make_optimizer(cfg)
    rng = jax.random.key(0)
    if cfg.contrastive_mode in ("moco", "distill"):
        template = statelib.create_moco_state(rng, cfg, mcfg, tx)
    else:
        template = statelib.create_inbatch_state(rng, cfg, mcfg, tx)
    host = jax.tree.map(np.asarray, template)
    restored, _ = ckpt.load(host, args.checkpoint)
    params = (restored.params_q if hasattr(restored, "params_q")
              else restored.params)

    hf_interop.save_hf_dir(params, mcfg, args.output_dir)
    if args.vocab_file and os.path.exists(args.vocab_file):
        shutil.copy(args.vocab_file,
                    os.path.join(args.output_dir, "vocab.txt"))
    logger.info("Exported step-%d encoder to %s",
                int(np.asarray(restored.step)), args.output_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
