"""CLI: BlobInspector-style quantification + fixed-scale density heatmaps —
flag-compatible with the reference `quantify.py:115-129` (including the
required --px_per_micron and the extra --kernel_size/--nb_layers/
--contour_thresh/--contour_min_size knobs)."""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--img_dir", required=True)
    p.add_argument("--ckpt_path", default="best_UNetDC_focal_model.pth")
    p.add_argument("--out_dir", default="quanti_results")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prob_thresh", type=float, default=0.3)
    p.add_argument("--min_area", type=int, default=1)
    p.add_argument("--px_per_micron", type=float, required=True)
    p.add_argument("--save_overlays", action="store_true")
    p.add_argument("--kernel_size", type=int, default=55)
    p.add_argument("--nb_layers", type=int, default=3)
    p.add_argument("--contour_thresh", type=int, default=0)
    p.add_argument("--contour_min_size", type=int, default=20)
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--data_parallel", type=int, default=0)
    p.add_argument("--max_labels", type=int, default=4096,
                   help="per-image component table capacity")
    return p


def main(argv=None):
    from unetdc_tpu.utils.compile_cache import maybe_enable_compilation_cache

    from unetdc_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # $UNETDC_TPU_PLATFORM opt-in
    maybe_enable_compilation_cache()  # $UNETDC_TPU_COMPILE_CACHE opt-in
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from unetdc_tpu.checkpoint import (load_pth_state_dict,
                                       torch_state_dict_to_variables,
                                       load_checkpoint)
    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.pipelines.heatmaps import (BlobInspectorEngine,
                                               BlobInspectorPipeline)

    if args.ckpt_path.endswith(".pth"):
        variables = torch_state_dict_to_variables(
            load_pth_state_dict(args.ckpt_path))
    else:
        variables = load_checkpoint(args.ckpt_path)
    mesh = make_mesh(args.data_parallel) if args.data_parallel else None
    engine = BlobInspectorEngine(
        variables,
        compute_dtype=jnp.bfloat16 if args.precision == "bf16"
        else jnp.float32, mesh=mesh, max_labels=args.max_labels,
        kernel_size=args.kernel_size, nb_layers=args.nb_layers,
        contour_thresh=args.contour_thresh,
        contour_min_size=args.contour_min_size)
    pipe = BlobInspectorPipeline(
        engine, args.out_dir, batch=args.batch, prob_thresh=args.prob_thresh,
        min_area=args.min_area, px_per_micron=args.px_per_micron,
        save_overlays=args.save_overlays)
    pipe.run(args.img_dir)
    print("✅ All done! Outputs are in", pipe.out_dir)


if __name__ == "__main__":
    main()
