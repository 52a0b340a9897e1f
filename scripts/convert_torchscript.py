#!/usr/bin/env python3
"""Convert / distill the reference's TorchScript model binaries.

The reference ships ParseNet and its CTC recognizer only as TorchScript
archives (reference: pero_ocr/layout_engines/torch_parsenet.py:15,
pero_ocr/ocr_engine/pytorch_ocr_engine.py:52-57).  Three modes:

inspect   Print the serialized graph's op histogram + parameter table,
          flagging any op the JAX interpreter doesn't cover.

verify    Convert via the graph interpreter (utils/ts_graph.py) and
          compare the torch and JAX forward passes on random inputs —
          the acceptance gate before pointing an engine config at the
          binary.  Engines consume verified binaries DIRECTLY (the
          MODEL_PATH / OCR JSON ``checkpoint`` may simply name the .pt
          file); no separate artifact is needed.

distill   Train a NATIVE flax model (space-to-depth stems, fused scans
          — the TPU-speed architectures) against the converted binary
          as the teacher, on a folder of page/line images (or synthetic
          pages when none are given).  Writes a standard msgpack
          checkpoint for MODEL_PATH / ``checkpoint``.  Use when the
          interpreted graph is correctness-parity but slower than the
          native architecture on TPU.

Examples:
    python scripts/convert_torchscript.py inspect ParseNet.pt
    python scripts/convert_torchscript.py verify ParseNet.pt --family parsenet
    python scripts/convert_torchscript.py distill ocr.pt --family ctc \\
        --charset-size 100 --images lines/ --out ocr_native.ckpt
"""

import argparse
import glob
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pero_ocr_tpu.utils import jax_setup

logger = logging.getLogger("convert_torchscript")


def cmd_inspect(args) -> int:
    from pero_ocr_tpu.utils.ts_graph import (
        inspect_torchscript, load_torchscript,
    )

    print(inspect_torchscript(load_torchscript(args.model)))
    return 0


def _random_inputs(family: str, batch: int, rng: np.random.RandomState):
    if family == "parsenet":
        return (rng.rand(batch, 3, 192, 256).astype(np.float32),)
    return (rng.rand(batch, 3, 32, 512).astype(np.float32),)


def cmd_verify(args) -> int:
    import torch

    from pero_ocr_tpu.utils.ts_graph import load_torchscript, ts_to_jax

    module = load_torchscript(args.model)
    fn, params = ts_to_jax(module)
    rng = np.random.RandomState(0)
    worst = 0.0
    for trial in range(args.trials):
        inputs = _random_inputs(args.family, args.batch, rng)
        with torch.no_grad():
            ref = module(*[torch.from_numpy(x) for x in inputs])
        out = fn(params, *inputs)
        refs = ref if isinstance(ref, (tuple, list)) else (ref,)
        outs = out if isinstance(out, (tuple, list)) else (out,)
        for r, o in zip(refs, outs):
            diff = float(np.abs(r.numpy() - np.asarray(o)).max())
            worst = max(worst, diff)
        print(f"trial {trial}: max abs diff {worst:.3e}")
    ok = worst <= args.tolerance
    print(f"{'PASS' if ok else 'FAIL'}: worst {worst:.3e} "
          f"(tolerance {args.tolerance:.1e})")
    return 0 if ok else 1


def _load_images(pattern, count, rng):
    import cv2

    files = sorted(glob.glob(pattern)) if pattern else []
    images = []
    for path in files[:count]:
        img = cv2.imread(path)
        if img is not None:
            images.append(img)
    return images


def _synthetic_pages(count, shape, rng):
    """Text-like synthetic pages when no image folder is given: dark
    horizontal strokes on light background (enough signal for a layout/
    recognizer distillation smoke; real data gives real CER parity)."""
    pages = []
    h, w = shape
    for _ in range(count):
        page = np.full((h, w), 235, np.uint8)
        y = 8
        while y + 10 < h:
            n_seg = rng.randint(3, 8)
            x = rng.randint(4, 20)
            for _ in range(n_seg):
                seg_w = rng.randint(10, max(12, w // n_seg - 8))
                if x + seg_w >= w:
                    break
                page[y : y + 6, x : x + seg_w] = rng.randint(10, 80)
                x += seg_w + rng.randint(4, 16)
            y += rng.randint(12, 20)
        pages.append(np.stack([page] * 3, axis=-1))
    return pages


def cmd_distill(args) -> int:
    import cv2
    import jax
    import jax.numpy as jnp
    import optax

    from pero_ocr_tpu.utils.checkpoint import save_variables
    from pero_ocr_tpu.utils.ts_graph import load_torchscript, ts_to_jax

    module = load_torchscript(args.model)
    teacher_fn, teacher_params = ts_to_jax(module)
    rng = np.random.RandomState(0)
    jrng = jax.random.PRNGKey(0)

    if args.family == "parsenet":
        from pero_ocr_tpu.models.parsenet import ParseNet

        shape = (256, 320)
        images = _load_images(args.images, args.num_samples, rng)
        if images:
            images = [
                cv2.resize(im, (shape[1], shape[0])) for im in images
            ]
        else:
            images = _synthetic_pages(args.num_samples, shape, rng)
        student = ParseNet(stem=args.stem)
        variables = student.init(
            jrng, jnp.zeros((1,) + shape + (3,), jnp.float32)
        )

        @jax.jit
        def teacher(batch_nhwc):
            out = teacher_fn(
                teacher_params, jnp.transpose(batch_nhwc, (0, 3, 1, 2))
            )
            if isinstance(out, (tuple, list)):
                out = out[0]
            return jnp.transpose(out, (0, 2, 3, 1))

        def loss_fn(params, batch, target):
            pred = student.apply(params, batch)
            ch = min(pred.shape[-1], target.shape[-1])
            return jnp.mean((pred[..., :ch] - target[..., :ch]) ** 2)

    else:
        from pero_ocr_tpu.models.recognizer import (
            CTCRecognizer, RecognizerSpec,
        )
        from pero_ocr_tpu.utils.ts_adapters import TSRecognizerModel

        probe = TSRecognizerModel(module, line_height=args.line_height)
        shape = (args.line_height, 512)
        images = _load_images(args.images, args.num_samples, rng)
        if images:
            images = [
                cv2.resize(im, (shape[1], shape[0])) for im in images
            ]
        else:
            images = _synthetic_pages(args.num_samples, shape, rng)
        spec = RecognizerSpec(
            num_classes=probe.spec.num_classes,
            line_height=args.line_height,
            subsampling=probe.spec.subsampling,
            stem=args.stem if args.stem != "conv" else "s2d",
        )
        student = CTCRecognizer(spec)
        variables = student.init(
            jrng, jnp.zeros((1,) + shape + (3,), jnp.float32)
        )

        @jax.jit
        def teacher(batch_nhwc):
            return probe.apply(probe.variables, batch_nhwc)

        def loss_fn(params, batch, target):
            # Frame-level KL against the teacher's CTC posteriors.
            pred = jax.nn.log_softmax(student.apply(params, batch))
            tgt = jax.nn.softmax(target)
            t = min(pred.shape[1], tgt.shape[1])
            return -jnp.mean(
                jnp.sum(tgt[:, :t] * pred[:, :t], axis=-1)
            )

    optimizer = optax.adam(args.learning_rate)
    opt_state = optimizer.init(variables)

    @jax.jit
    def step(params, opt_state, batch, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, target)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    batch_size = args.batch
    images_np = np.stack(images).astype(np.float32) / 255.0
    for it in range(args.steps):
        idx = rng.randint(0, len(images_np), batch_size)
        batch = jnp.asarray(images_np[idx])
        target = teacher(batch)
        variables, opt_state, loss = step(
            variables, opt_state, batch, target
        )
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it}: distill loss {float(loss):.5f}")

    save_variables(variables, args.out)
    print(f"wrote native checkpoint {args.out}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("inspect")
    p.add_argument("model")

    p = sub.add_parser("verify")
    p.add_argument("model")
    p.add_argument("--family", choices=["parsenet", "ctc"], default="parsenet")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--tolerance", type=float, default=1e-3)

    p = sub.add_parser("distill")
    p.add_argument("model")
    p.add_argument("--family", choices=["parsenet", "ctc"], default="parsenet")
    p.add_argument("--images", default=None,
                   help="glob of training images (default: synthetic)")
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num-samples", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--line-height", type=int, default=32)
    p.add_argument("--stem", default="s2d",
                   help="native student stem (s2d = TPU fast stem)")

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    jax_setup.configure()
    return {
        "inspect": cmd_inspect, "verify": cmd_verify,
        "distill": cmd_distill,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
