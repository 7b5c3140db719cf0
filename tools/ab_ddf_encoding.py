"""DDF encoding A/B (VERDICT r2 task 4): hash (the reference's config,
``/root/reference/neusky/configs/neusky_config.py:162-177``) vs nerf
frequency (the framework default) — trained STANDALONE against the same
frozen scene, the reference's own DDF protocol
(``neusky/pipelines/ddf_pipeline.py:79-302``: frozen SDF generates GT).

Why standalone and not the joint step: the hash DDF costs ~33M scatter
rows/step inside the visibility loop — measured ≫10× joint-step wall time
(PERF.md r3), so a 5k joint A/B is 20+ chip-hours. The standalone trainer
isolates exactly the quantity in question (DDF depth quality per encoding
vs the same frozen geometry) at ~100× less compute. The joint-step
*throughput* cost of hash is measured separately via
``NEUSKY_DDF_ENCODING=hash python bench.py``.

Usage (TPU, one process):
  python tools/ab_ddf_encoding.py --ckpt /tmp/ckpt_r3_20k \
      --steps 2000 --out results/r3_ab_ddf_standalone.jsonl
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/ckpt_r3_20k",
                    help="frozen NeuSky scene checkpoint (canonical topology)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--out", default="results/r3_ab_ddf_standalone.jsonl")
    ap.add_argument("--encodings", default="nerf,hash")
    args = ap.parse_args()

    import jax

    from neusky_tpu.configs.neusky_config import neusky_model_config
    from neusky_tpu.data.datamanager import DataManager, DataManagerConfig
    from neusky_tpu.data.pixel_sampler import PixelSamplerConfig
    from neusky_tpu.data.synthetic import (
        SyntheticSceneConfig,
        generate_synthetic_scene,
    )
    from neusky_tpu.engine.checkpoint import (
        load_illumination_prior,
        load_param_subtrees,
    )
    from neusky_tpu.engine.ddf_trainer import DDFTrainer, DDFTrainerConfig
    from neusky_tpu.models.neusky import NeuSkyModel
    from neusky_tpu.sampling.ddf_sampler import DDFSamplerConfig

    out = open(args.out, "a")

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        out.write(line + "\n")
        out.flush()

    # same scene/topology as the canonical 20k run (tools/train_sanity.py)
    scene = generate_synthetic_scene(
        SyntheticSceneConfig(num_cameras=8, width=64, height=64)
    )
    for enc in args.encodings.split(","):
        base = neusky_model_config(num_train_data=8, num_eval_data=2)
        cfg = dataclasses.replace(
            base,
            ddf=dataclasses.replace(
                base.ddf,
                field=dataclasses.replace(
                    base.ddf.field, position_encoding_type=enc
                ),
            ),
        )
        model = NeuSkyModel(cfg)
        params = model.init(jax.random.PRNGKey(0))
        params = load_illumination_prior(params, cfg)
        # frozen scene from the checkpoint; ddf_field stays the fresh init
        # for THIS encoding (the ckpt's ddf subtree is nerf-shaped)
        params = load_param_subtrees(
            args.ckpt, None, params, exclude=("ddf_field",)
        )
        dm = DataManager(
            DataManagerConfig(
                pixel_sampler=PixelSamplerConfig(
                    images_per_batch=8, rays_per_image=128
                ),
                num_sky_rays=256,
            ),
            scene["cameras"], scene["images"], scene["masks"],
        )
        tcfg = DDFTrainerConfig(
            max_num_iterations=args.steps,
            steps_per_log=args.log_every,
            sampler=DDFSamplerConfig(
                num_samples_on_sphere=8, num_rays_per_sample=128,
                only_sample_upper_hemisphere=True, concentration=20.0,
            ),
            num_sky_rays=256,
        )
        trainer = DDFTrainer(tcfg, model, params, datamanager=dm)
        t0 = time.time()
        emit({"arm": enc, "event": "start"})
        trainer.run(
            num_steps=args.steps,
            log_fn=lambda rec: emit(
                {"arm": enc, "elapsed_s": round(time.time() - t0, 1),
                 **{k: round(v, 5) if isinstance(v, float) else v
                    for k, v in rec.items()}}
            ),
        )
        emit({
            "arm": enc, "event": "done",
            "final_depth_psnr": trainer.history[-1]["depth_psnr"],
            "steps_per_sec": round(args.steps / (time.time() - t0), 3),
        })
    out.close()


if __name__ == "__main__":
    main()
