"""TorchScript-binary conversion: graph interpreter + engine integration.

The reference's ParseNet / CTC recognizer are distributed ONLY as
TorchScript archives (reference: pero_ocr/layout_engines/torch_parsenet.py:15,
pero_ocr/ocr_engine/pytorch_ocr_engine.py:52-57).  These tests trace
torch modules of both families, save REAL ``.pt`` artifacts, and verify
the JAX interpretation matches the torch forward bit-tight — proving the
"opaque binary" distribution format converts without architecture
source.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from pero_ocr_tpu.utils.ts_adapters import (  # noqa: E402
    TSParseNetModel, TSRecognizerModel, is_torchscript_file,
)
from pero_ocr_tpu.utils.ts_graph import (  # noqa: E402
    inspect_torchscript, load_torchscript, ts_to_jax,
)


class MiniUNet(tnn.Module):
    """ParseNet-shaped teacher: conv/BN encoder, transposed-conv +
    bilinear-upsample decoder with skip concats, 5-channel head, and the
    reference binaries' ``(out_map, extra)`` tuple return
    (torch_parsenet.py:51 unpacks exactly this)."""

    def __init__(self):
        super().__init__()
        self.enc1 = tnn.Sequential(
            tnn.Conv2d(3, 8, 3, padding=1), tnn.BatchNorm2d(8),
            tnn.LeakyReLU(0.1),
        )
        self.enc2 = tnn.Sequential(
            tnn.MaxPool2d(2), tnn.Conv2d(8, 16, 3, padding=1),
            tnn.BatchNorm2d(16), tnn.ReLU(),
        )
        self.enc3 = tnn.Sequential(
            tnn.MaxPool2d(2), tnn.Conv2d(16, 32, 3, padding=1),
            tnn.ReLU(),
        )
        self.up2 = tnn.ConvTranspose2d(32, 16, 2, stride=2)
        self.dec2 = tnn.Conv2d(32, 16, 3, padding=1)
        self.dec1 = tnn.Conv2d(24, 8, 3, padding=1)
        self.head = tnn.Conv2d(8, 5, 1)

    def forward(self, x):
        e1 = self.enc1(x)
        e2 = self.enc2(e1)
        e3 = self.enc3(e2)
        d2 = torch.relu(self.dec2(torch.cat([self.up2(e3), e2], dim=1)))
        d1 = torch.nn.functional.interpolate(
            d2, scale_factor=2, mode="bilinear", align_corners=False
        )
        d1 = torch.relu(self.dec1(torch.cat([d1, e1], dim=1)))
        return self.head(d1), e3.mean()


class MiniCTCNet(tnn.Module):
    """CTC-recognizer-shaped teacher: VGG-ish conv stack collapsing
    height, 2-layer BiLSTM, linear logits head — the reference CTC
    binaries' family (pytorch_ocr_engine.py:59-74: NCHW [0,1] input,
    (N, T, C) logits, subsampling 4)."""

    def __init__(self, num_classes=12):
        super().__init__()
        self.convs = tnn.Sequential(
            tnn.Conv2d(3, 8, 3, padding=1), tnn.ReLU(),
            tnn.MaxPool2d(2),                       # H/2, W/2
            tnn.Conv2d(8, 16, 3, padding=1), tnn.ReLU(),
            tnn.MaxPool2d(2),                       # H/4, W/4
            tnn.Conv2d(16, 32, 3, padding=1), tnn.ReLU(),
            tnn.MaxPool2d((2, 1)),                  # H/8, W/4
        )
        self.collapse = tnn.Conv2d(32, 48, (4, 1))  # height 32 -> 1
        self.lstm = tnn.LSTM(
            48, 32, num_layers=2, batch_first=True, bidirectional=True
        )
        self.fc = tnn.Linear(64, num_classes)

    def forward(self, x):
        x = self.convs(x)
        x = torch.relu(self.collapse(x))
        x = x.squeeze(2).permute(0, 2, 1)  # (N, T, C)
        x, _ = self.lstm(x)
        return self.fc(x)


def _roundtrip(module, example, tmp_path, name):
    """Trace, SAVE to a real .pt archive, and reload — the artifact
    format the reference distributes."""
    ts = torch.jit.trace(module.eval(), example)
    path = str(tmp_path / name)
    ts.save(path)
    assert is_torchscript_file(path)
    return path


class TestGraphInterpreter:
    def test_unet_parity(self, tmp_path):
        torch.manual_seed(0)
        m = MiniUNet().eval()
        x = torch.rand(2, 3, 32, 48)
        path = _roundtrip(m, x, tmp_path, "parsenet.pt")

        fn, params = ts_to_jax(load_torchscript(path))
        with torch.no_grad():
            ref_map, ref_extra = m(x)
        out_map, out_extra = fn(params, x.numpy())
        np.testing.assert_allclose(
            ref_map.numpy(), np.asarray(out_map), atol=2e-5
        )
        np.testing.assert_allclose(
            float(ref_extra), float(out_extra), atol=2e-5
        )

    def test_ctc_net_parity(self, tmp_path):
        torch.manual_seed(1)
        m = MiniCTCNet().eval()
        x = torch.rand(3, 3, 32, 128)
        path = _roundtrip(m, x, tmp_path, "ocr.pt")

        fn, params = ts_to_jax(load_torchscript(path))
        with torch.no_grad():
            ref = m(x).numpy()
        out = np.asarray(fn(params, x.numpy()))
        assert out.shape == ref.shape  # (3, 32, 12): subsampling 4
        np.testing.assert_allclose(ref, out, atol=2e-5)

    def test_jit_and_shape_polymorphism(self, tmp_path):
        """The converted fn retraces cleanly under jax.jit at widths the
        torch trace never saw (the graph stores no baked shapes for
        conv/pool/LSTM paths)."""
        import jax

        torch.manual_seed(2)
        m = MiniCTCNet().eval()
        path = _roundtrip(m, torch.rand(1, 3, 32, 64), tmp_path, "o.pt")
        fn, params = ts_to_jax(load_torchscript(path))
        jfn = jax.jit(fn)
        x = torch.rand(2, 3, 32, 256)
        with torch.no_grad():
            ref = m(x).numpy()
        np.testing.assert_allclose(
            ref, np.asarray(jfn(params, x.numpy())), atol=2e-5
        )

    def test_align_corners_true_bilinear(self):
        m = tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
        x = torch.rand(1, 2, 5, 7)
        ts = torch.jit.trace(m.eval(), x)
        fn, params = ts_to_jax(ts)
        np.testing.assert_allclose(
            m(x).detach().numpy(), np.asarray(fn(params, x.numpy())),
            atol=1e-5,
        )

    def test_gru_and_avgpool(self):
        class Net(tnn.Module):
            def __init__(self):
                super().__init__()
                self.gru = tnn.GRU(6, 5, num_layers=2, batch_first=True,
                                   bidirectional=True)
                self.pool = tnn.AvgPool2d(2)

            def forward(self, x):
                y = self.pool(x)            # (N, C, H/2, W/2)
                y = y.flatten(2).permute(0, 2, 1)
                out, h = self.gru(y)
                return out, h

        torch.manual_seed(3)
        m = Net().eval()
        x = torch.rand(2, 6, 8, 10)
        ts = torch.jit.trace(m, x)
        fn, params = ts_to_jax(ts)
        with torch.no_grad():
            ref_out, ref_h = m(x)
        out, h = fn(params, x.numpy())
        np.testing.assert_allclose(ref_out.numpy(), np.asarray(out), atol=2e-5)
        np.testing.assert_allclose(ref_h.numpy(), np.asarray(h), atol=2e-5)

    def test_addmm_beta_alpha(self):
        """torch.addmm = beta*input + alpha*(mat1@mat2) — the scalar
        order is load-bearing for any traced Linear with fused scaling
        (advisor r3: operands were swapped)."""
        class Net(tnn.Module):
            def forward(self, inp, m1, m2):
                return torch.addmm(inp, m1, m2, beta=3.0, alpha=10.0)

        inp, m1, m2 = torch.rand(2, 4), torch.rand(2, 3), torch.rand(3, 4)
        ts = torch.jit.trace(Net().eval(), (inp, m1, m2))
        fn, params = ts_to_jax(ts)
        ref = Net()(inp, m1, m2).numpy()
        out = np.asarray(fn(params, inp.numpy(), m1.numpy(), m2.numpy()))
        np.testing.assert_allclose(ref, out, atol=1e-5)

    def test_nearest_upsample_non_multiple(self):
        """torch nearest uses idx = floor(dst*in/out), not half-pixel
        centers — diverges from jax.image.resize at non-integer ratios
        (advisor r3)."""
        m = tnn.Upsample(size=(5, 7), mode="nearest")
        x = torch.arange(2 * 3 * 4, dtype=torch.float32).reshape(1, 2, 3, 4)
        ts = torch.jit.trace(m.eval(), x)
        fn, params = ts_to_jax(ts)
        np.testing.assert_array_equal(
            m(x).numpy(), np.asarray(fn(params, x.numpy()))
        )

    def test_lstm_gru_nonzero_initial_state(self):
        """aten::lstm / aten::gru must honour a provided hx instead of
        silently starting from zeros (advisor r3)."""
        class Net(tnn.Module):
            def __init__(self):
                super().__init__()
                self.lstm = tnn.LSTM(4, 5, num_layers=2, bidirectional=True)
                self.gru = tnn.GRU(10, 6)

            def forward(self, x, h0, c0, g0):
                y, _ = self.lstm(x, (h0, c0))
                z, hg = self.gru(y, g0)
                return z, hg

        torch.manual_seed(7)
        m = Net().eval()
        x = torch.rand(9, 2, 4)
        h0, c0 = torch.rand(4, 2, 5), torch.rand(4, 2, 5)
        g0 = torch.rand(1, 2, 6)
        ts = torch.jit.trace(m, (x, h0, c0, g0))
        fn, params = ts_to_jax(ts)
        with torch.no_grad():
            ref_z, ref_h = m(x, h0, c0, g0)
        z, hg = fn(params, x.numpy(), h0.numpy(), c0.numpy(), g0.numpy())
        np.testing.assert_allclose(ref_z.numpy(), np.asarray(z), atol=2e-5)
        np.testing.assert_allclose(ref_h.numpy(), np.asarray(hg), atol=2e-5)

    def test_avgpool_count_include_pad_ceil(self):
        """count_include_pad=True counts the symmetric padding but not
        the ceil-mode extra (advisor r3)."""
        m = tnn.AvgPool2d(3, stride=2, padding=1, ceil_mode=True,
                          count_include_pad=True)
        x = torch.rand(1, 2, 6, 8)
        ts = torch.jit.trace(m.eval(), x)
        fn, params = ts_to_jax(ts)
        np.testing.assert_allclose(
            m(x).numpy(), np.asarray(fn(params, x.numpy())), atol=1e-6
        )

    def test_unsupported_op_reports_kind(self):
        class Weird(tnn.Module):
            def forward(self, x):
                return torch.fft.rfft(x, dim=-1).real

        ts = torch.jit.trace(Weird().eval(), torch.rand(2, 8))
        fn, params = ts_to_jax(ts)
        with pytest.raises(NotImplementedError, match="aten::"):
            fn(params, np.random.rand(2, 8).astype(np.float32))

    def test_inspect_report(self, tmp_path):
        m = MiniCTCNet().eval()
        path = _roundtrip(m, torch.rand(1, 3, 32, 64), tmp_path, "o.pt")
        report = inspect_torchscript(load_torchscript(path))
        assert "aten::lstm" in report
        assert "total parameters" in report
        assert "NOT SUPPORTED" not in report


class TestAdapters:
    def test_parsenet_adapter_nhwc(self, tmp_path):
        torch.manual_seed(4)
        m = MiniUNet().eval()
        path = _roundtrip(m, torch.rand(1, 3, 32, 32), tmp_path, "p.pt")
        model = TSParseNetModel.load(path)
        imgs = np.random.rand(2, 32, 48, 3).astype(np.float32)
        maps = np.asarray(model.apply(model.variables, imgs))
        with torch.no_grad():
            ref = m(torch.from_numpy(imgs).permute(0, 3, 1, 2))[0]
        np.testing.assert_allclose(
            ref.permute(0, 2, 3, 1).numpy(), maps, atol=2e-5
        )

    def test_recognizer_adapter_probes_spec(self, tmp_path):
        torch.manual_seed(5)
        m = MiniCTCNet(num_classes=9).eval()
        path = _roundtrip(m, torch.rand(1, 3, 32, 64), tmp_path, "r.pt")
        model = TSRecognizerModel.load(path, line_height=32)
        assert model.spec.num_classes == 9
        assert model.spec.subsampling == 4
        imgs = np.random.rand(2, 32, 128, 3).astype(np.float32)
        logits = np.asarray(model.apply(model.variables, imgs))
        assert logits.shape == (2, 32, 9)


class TestEngineIntegration:
    def test_ctc_engine_loads_torchscript_checkpoint(self, tmp_path):
        """The OCR JSON ``checkpoint`` may name the reference's .pt
        directly; transcription must agree with the torch forward +
        greedy collapse (pytorch_ocr_engine.py:59-74)."""
        import json

        from pero_ocr_tpu.ocr.ctc_engine import CTCEngineLineOCR

        torch.manual_seed(6)
        chars = list("abcdefghijk")  # 11 chars + blank = 12 classes
        m = MiniCTCNet(num_classes=12).eval()
        _roundtrip(m, torch.rand(1, 3, 32, 64), tmp_path, "ocr.pt")
        (tmp_path / "ocr.json").write_text(json.dumps({
            "characters": chars,
            "line_px_height": 32,
            "checkpoint": "ocr.pt",
        }), encoding="utf8")

        engine = CTCEngineLineOCR(str(tmp_path / "ocr.json"), batch_size=2)
        assert engine.net_subsampling == 4
        assert len(engine.characters) == 12

        batch = np.random.default_rng(0).integers(
            0, 255, size=(2, 32, 96, 3), dtype=np.uint8
        )
        texts, logits = engine.run_ocr(batch, np.array([96, 96]))
        assert len(texts) == 2 and logits[0].shape == (24, 12)

        # Greedy decode parity vs torch.
        with torch.no_grad():
            ref = m(
                torch.from_numpy(batch).float().permute(0, 3, 1, 2) / 255.0
            ).numpy()
        np.testing.assert_allclose(ref, np.stack(logits), atol=3e-5)

    def test_parsenet_wrapper_loads_torchscript(self, tmp_path):
        from pero_ocr_tpu.layout_engines.parsenet_wrapper import (
            ParseNetWrapper,
        )

        torch.manual_seed(7)
        m = MiniUNet().eval()
        path = _roundtrip(m, torch.rand(1, 3, 64, 64), tmp_path, "pn.pt")
        wrapper = ParseNetWrapper(
            model_path=path, downsample=2, adaptive_downsample=False
        )
        img = np.random.default_rng(1).integers(
            0, 255, size=(100, 120, 3), dtype=np.uint8
        )
        maps = wrapper.get_maps(img, downsample=2)
        assert maps.shape == (50, 60, 5)
        with torch.no_grad():
            canvas = np.zeros((64, 64, 3), np.uint8)
            import cv2

            small = cv2.resize(
                img, (0, 0), fx=0.5, fy=0.5, interpolation=cv2.INTER_AREA
            )
            canvas[:50, :60] = small
            ref = m(
                torch.from_numpy(
                    canvas[None].astype(np.float32) / 255.0
                ).permute(0, 3, 1, 2)
            )[0].permute(0, 2, 3, 1).numpy()[0, :50, :60]
        np.testing.assert_allclose(ref, maps, atol=3e-5)


class TestFastPipeline:
    def test_torchscript_recognizer_in_device_pipeline(self, tmp_path):
        """A converted TorchScript CTC binary must run inside the
        device-resident serving pipeline's stage B (crops transport)
        and transcribe identically to its own host-side greedy decode."""
        import jax
        import jax.numpy as jnp

        from pero_ocr_tpu.models.parsenet import ParseNet
        from pero_ocr_tpu.ops import ctc as ctc_ops
        from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

        torch.manual_seed(9)
        m = MiniCTCNet(num_classes=12).eval()
        path = _roundtrip(m, torch.rand(1, 3, 32, 64), tmp_path, "r.pt")
        rec = TSRecognizerModel.load(path, line_height=32)

        parsenet = ParseNet(base_features=4, depth=2)
        pn_params = parsenet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        pipe = TPUPagePipeline(
            parsenet, pn_params, rec, rec.variables,
            downsample=4, crop_height=32, crop_bucket=128, line_slot=4,
            transport="crops", transport_bits=8,
            cluster_paragraphs=False,
        )
        page = np.random.default_rng(2).integers(
            0, 255, size=(256, 256, 3), dtype=np.uint8
        )

        def override(pg):
            return (
                [np.array([[10.0, 60.0], [120.0, 60.0]]),
                 np.array([[10.0, 120.0], [120.0, 120.0]])],
                [[20.0, 8.0], [20.0, 8.0]],
            )

        results = list(pipe.run([page], lines_override=override,
                                page_batch=1))
        assert len(results) == 1 and results[0].labels is not None
        assert results[0].labels.shape[0] >= 2

        # Device decode == host decode of the same crop through the
        # converted forward.
        gray = pipe._gray(page)
        bl, hh = override(page)
        crop = pipe._host_crop_line(gray, bl[0], hh[0])
        crop_p = np.zeros((32, 128), np.uint8)
        crop_p[:, : crop.shape[1]] = crop
        imgs = np.repeat(
            crop_p[None, :, :, None], 3, axis=3
        ).astype(np.float32) / 255.0
        logits = rec.apply(rec.variables, jnp.asarray(imgs))
        labels, lengths = ctc_ops.greedy_ctc_labels(
            logits, jnp.full((1,), logits.shape[1], jnp.int32)
        )
        n = int(np.asarray(lengths)[0])
        got = results[0].labels[0]
        got_n = int(results[0].label_lengths[0])
        assert got_n == n
        np.testing.assert_array_equal(
            np.asarray(labels)[0, :n], got[:n]
        )


class TestConvertCLI:
    def test_verify_and_distill(self, tmp_path, capsys):
        import sys

        sys.path.insert(0, "scripts")
        import convert_torchscript as cli

        torch.manual_seed(8)
        m = MiniUNet().eval()
        path = _roundtrip(m, torch.rand(1, 3, 64, 64), tmp_path, "pn.pt")
        assert cli.main(["inspect", path]) == 0
        assert cli.main([
            "verify", path, "--family", "parsenet", "--trials", "1",
        ]) == 0
        out = str(tmp_path / "native.ckpt")
        assert cli.main([
            "distill", path, "--family", "parsenet", "--out", out,
            "--steps", "3", "--batch", "2", "--num-samples", "8",
        ]) == 0
        assert (tmp_path / "native.ckpt").exists()
