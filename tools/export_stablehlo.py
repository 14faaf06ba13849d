"""Export the stereo model as a serialized StableHLO module for C++ serving.

TPU-native counterpart of the reference's ONNX exporters
(``/root/reference/onnx_transformed.py``): where CUDA serving goes
model -> ONNX -> TensorRT ``.plan``, TPU serving goes
model -> StableHLO -> PJRT CompileAndLoad. The module is closure-converted
(weights inlined as constants) at a fixed input shape, so the C++ runtime
(``serving/``) only needs the artifact plus a PJRT plugin .so.

Outputs:
  * ``<name>.stablehlo.mlir``  — plain MLIR text (portable input to PJRT)
  * ``<name>.jax_export.bin``  — jax.export serialized artifact (versioned,
    reloadable from Python via jax.export.deserialize)
"""

from __future__ import annotations

import argparse
import os

from common import add_model_args, build_config


def parse_args():
    p = argparse.ArgumentParser(description="StableHLO exporter")
    add_model_args(p)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--loadckpt", default="")
    p.add_argument("--out", default="./StereoModel")
    p.add_argument("--confidence", action="store_true",
                   help="export the confidence variant (disp + confidence)")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from esmstereo_tpu.eval.runner import load_model_for_eval

    assert args.height % 32 == 0 and args.width % 32 == 0, \
        "export shapes must be /32 multiples (reference pads to /32)"

    cfg = build_config(args)
    if args.confidence:
        from esmstereo_tpu.models.confidence import ESMStereoConfidence
        model = ESMStereoConfidence(config=cfg)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.key(0), l, r, train=False)
        )(dummy, dummy)
        if args.loadckpt:
            from esmstereo_tpu.train.checkpoints import restore_variables
            tree = restore_variables(args.loadckpt)
            variables = {"params": tree["params"],
                         "batch_stats": tree["batch_stats"]}

        def infer(left, right):
            disp, conf = model.apply(variables, left, right, train=False)
            return disp, conf
    else:
        model, variables = load_model_for_eval(cfg, args.loadckpt)

        def infer(left, right):
            # single full-res output, like ESMStereo_trt (eval path)
            return model.apply(variables, left, right, train=False)[0]

    shape = jax.ShapeDtypeStruct((1, args.height, args.width, 3),
                                 jnp.float32)
    exported = jax.export.export(jax.jit(infer))(shape, shape)

    mlir_path = args.out + ".stablehlo.mlir"
    with open(mlir_path, "w") as f:
        f.write(exported.mlir_module())
    bin_path = args.out + ".jax_export.bin"
    with open(bin_path, "wb") as f:
        f.write(exported.serialize())
    print(f"wrote {mlir_path} ({os.path.getsize(mlir_path)} bytes)")
    print(f"wrote {bin_path} ({os.path.getsize(bin_path)} bytes)")
    print("input:", exported.in_avals, "-> output:", exported.out_avals)


if __name__ == "__main__":
    main()
