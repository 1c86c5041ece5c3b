"""CLI: segment lipid droplets and build a report — flag-compatible with the
reference `quantify_droplets_batch.py:100-128` (same names, defaults, and
output tree) but running the TPU-native pipeline.

    python -m unetdc_tpu.cli.quantify_droplets_batch --img_dir ... \
        --ckpt_path best_UNetDC_focal_model.pth --out_dir quant_results \
        --batch 8 --prob_thresh 0.3 --min_area 1 [--px_per_micron F]
        [--save_overlays] [--background_radius 50] [--skip_excel]
        [--skip_histogram]

Extra (TPU-only, additive) flags: --precision {bf16,f32}, --data_parallel N.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Segment lipid droplets and build a report")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--ckpt_path", default="best_UNetDC_focal_model.pth")
    p.add_argument("--out_dir", default="quant_results")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prob_thresh", type=float, default=0.3)
    p.add_argument("--min_area", type=int, default=1,
                   help="ignore objects smaller than this (pixels²)")
    p.add_argument("--px_per_micron", type=float,
                   help="pixels per micron for physical-unit columns")
    p.add_argument("--save_overlays", action="store_true")
    p.add_argument("--background_radius", type=int, default=50,
                   help="radius for rolling ball background correction")
    p.add_argument("--skip_excel", action="store_true",
                   help="skip generation of the Excel workbook")
    p.add_argument("--skip_histogram", action="store_true",
                   help="skip histogram plot generation")
    # TPU-native additions (defaults preserve reference behavior)
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16",
                   help="model compute precision on TPU")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the batch over N chips (0 = single chip)")
    p.add_argument("--profile", default=None, metavar="LOG_DIR",
                   help="write a jax.profiler TensorBoard trace to LOG_DIR")
    p.add_argument("--max_labels", type=int, default=4096,
                   help="per-image component capacity of the droplet tables")
    p.add_argument("--int8", action="store_true",
                   help="quantized forward on the MXU's double-rate int8 "
                        "path (~0.4%% per-tensor quantization error — masks "
                        "may differ marginally from --precision f32; on a "
                        "TRAINED (sigmoid-saturated) checkpoint agreement "
                        "is near-total — measured r5 on an on-chip-trained "
                        "model, see ROUND5.md int8_trained_agreement; the "
                        "0.845-0.996 worst-case envelope applies only to "
                        "random-init heads whose logits crowd the 0.3 "
                        "threshold). "
                        "Activation scales load from the --int8_calib "
                        "sidecar when it exists; otherwise they are "
                        "calibrated on the first images in sorted filename "
                        "order and saved there, so reruns are "
                        "deterministic regardless of dataset order")
    p.add_argument("--int8_calib", default="auto", metavar="PATH",
                   help="int8 calibration sidecar (.npz). 'auto' (default) "
                        "= <ckpt_path>.int8calib.npz; 'none' disables "
                        "persistence (scales recalibrated each run)")
    return p


def main(argv=None):
    from unetdc_tpu.utils.compile_cache import maybe_enable_compilation_cache

    from unetdc_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # $UNETDC_TPU_PLATFORM opt-in
    maybe_enable_compilation_cache()  # $UNETDC_TPU_COMPILE_CACHE opt-in
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.int8 and args.precision == "f32":
        # f32 is the bit-parity path; silently overriding it with the
        # quantized forward would hand back non-parity masks
        parser.error("--int8 contradicts --precision f32 (the parity path); "
                     "drop one of the two flags")

    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.pipelines.engine import load_engine
    from unetdc_tpu.pipelines.quantify_batch import BatchQuantifyPipeline

    from unetdc_tpu.utils.profiling import profile_trace

    mesh = make_mesh(args.data_parallel) if args.data_parallel else None
    calib_path = None
    if args.int8 and args.int8_calib != "none":
        calib_path = (args.ckpt_path + ".int8calib.npz"
                      if args.int8_calib == "auto" else args.int8_calib)
    engine = load_engine(args.ckpt_path, mesh=mesh,
                         fast=(args.precision == "bf16"),
                         max_labels=args.max_labels,
                         quantize="int8" if args.int8 else None,
                         calib_path=calib_path)
    pipe = BatchQuantifyPipeline(
        engine, args.out_dir, batch=args.batch, prob_thresh=args.prob_thresh,
        min_area=args.min_area, px_per_micron=args.px_per_micron,
        save_overlays=args.save_overlays,
        background_radius=args.background_radius)
    with profile_trace(args.profile):
        pipe.run(args.img_dir)
    pipe.write_reports(skip_excel=args.skip_excel,
                       skip_histogram=args.skip_histogram)
    if args.profile:
        from unetdc_tpu.utils.profiling import stage_report

        print(stage_report())
    # stdout contract consumed by the GUIs (gui_qt.py:113-116)
    print("\n All done. Outputs are in ", pipe.out_dir)


if __name__ == "__main__":
    main()
