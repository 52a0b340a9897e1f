"""OCR engine tests: config loading, width-bucketed batching, logit
bookkeeping, chunk merging — the batching coverage the reference lacks
(SURVEY.md §4 gaps)."""

import json

import numpy as np
import pytest

from pero_ocr_tpu.ocr.line_ocr_engine import (
    BaseEngineLineOCR,
    find_best_overlap,
    merge_transcriptions_and_logits,
)


@pytest.fixture
def tiny_config(tmp_path):
    cfg = {
        "characters": list("abc "),
        "line_px_height": 16,
        "line_vertical_scale": 1,
        "checkpoint": "missing.ckpt",
        "net_spec": {
            "conv_features": [4, 8],
            "subsampling": 2,
            "lstm_layers": 1,
            "lstm_features": 8,
        },
    }
    path = tmp_path / "ocr.json"
    path.write_text(json.dumps(cfg))
    return str(path)


class FakeEngine(BaseEngineLineOCR):
    """Base-engine harness with a deterministic fake network: transcription
    = 'x' * n_frames, logits = frame index ramp."""

    def __init__(self, json_def, **kwargs):
        super().__init__(json_def, **kwargs)
        self.net_subsampling = 2
        self.seen_batches = []

    def run_ocr(self, batch_data, widths):
        self.seen_batches.append(batch_data.shape)
        n_frames = batch_data.shape[2] // self.net_subsampling
        transcriptions = []
        logits = []
        for i in range(batch_data.shape[0]):
            transcriptions.append("x" * 3)
            frame = np.linspace(0, 1, n_frames)[:, None]
            logits.append(
                np.tile(frame, (1, len(self.characters) + 1)) * 10.0
            )
        return transcriptions, logits


class TestConfigLoading:
    def test_fields(self, tiny_config):
        engine = FakeEngine(tiny_config)
        assert engine.line_px_height == 16
        assert engine.characters == ("a", "b", "c", " ")
        assert engine.checkpoint.endswith("missing.ckpt")
        assert engine.embed_num is None
        assert engine.max_line_width == int(1e9)

    def test_embed_parsing(self, tmp_path):
        cfg = {
            "characters": ["a"],
            "line_px_height": 16,
            "line_vertical_scale": 1,
            "embed_num": 7,
            "embed_id": "mean",
        }
        p = tmp_path / "e.json"
        p.write_text(json.dumps(cfg))
        engine = FakeEngine(str(p))
        assert engine.embed_num == 7
        assert engine.embed_id == "mean"


class TestBatching:
    def test_width_buckets_bound_shapes(self, tiny_config):
        engine = FakeEngine(tiny_config, batch_size=4)
        rng = np.random.default_rng(0)
        widths = [100, 120, 130, 500, 520, 1400]
        lines = [
            rng.integers(0, 255, size=(16, w, 3), dtype=np.uint8) for w in widths
        ]
        transcriptions, logits, coords = engine.process_lines(lines)
        assert all(t == "xxx" for t in transcriptions)
        # All batch shapes must come from the bucket ladder.
        seen_widths = {s[2] for s in engine.seen_batches}
        assert seen_widths <= set(engine.width_buckets)
        # Lines of similar width share a batch: 100/120 -> 192 bucket,
        # 130 (+2*32 padding) -> 384, 500/520 -> 768, 1400 -> 1792.
        assert len(engine.seen_batches) == 4

    def test_height_mismatch_raises(self, tiny_config):
        engine = FakeEngine(tiny_config)
        with pytest.raises(ValueError):
            engine.process_lines([np.zeros((8, 100, 3), np.uint8)])

    def test_logit_coords_span(self, tiny_config):
        engine = FakeEngine(tiny_config)
        lines = [np.zeros((16, 100, 3), np.uint8)]
        _, logits, coords = engine.process_lines(lines)
        pad = engine.line_padding_px
        assert coords[0] == [pad // 2, (pad + 100) // 2]

    def test_sparse_logits(self, tiny_config):
        import scipy.sparse

        engine = FakeEngine(tiny_config)
        _, logits, _ = engine.process_lines([np.zeros((16, 64, 3), np.uint8)])
        assert scipy.sparse.issparse(logits[0])

    def test_no_logits(self, tiny_config):
        engine = FakeEngine(tiny_config)
        t, logits, coords = engine.process_lines(
            [np.zeros((16, 64, 3), np.uint8)], no_logits=True
        )
        assert t == ["xxx"]
        assert logits[0] is None


class TestOverlapMerge:
    def test_find_best_overlap(self):
        # "hello wor" + "o world!": true overlap of 7 ("o wor" ~).
        t1 = "hello wor"
        t2 = "lo world!"
        overlap = find_best_overlap(t1, t2)
        s1 = t1[-overlap:]
        s2 = t2[:overlap]
        assert s1 == s2  # perfect overlap found

    def test_merge_transcriptions(self):
        t1, t2 = "abcdef", "defghi"
        l1 = np.arange(6)[:, None] * np.ones((1, 3))
        l2 = (np.arange(6)[:, None] + 10) * np.ones((1, 3))
        merged, logits = merge_transcriptions_and_logits([t1, t2], [l1, l2])
        assert merged == "abcdefghi"
        assert logits.shape[0] == 9

    def test_merge_single_part_identity(self):
        t, logits = merge_transcriptions_and_logits(
            ["abc"], [np.zeros((3, 4))]
        )
        assert t == "abc"


class TestChunking:
    def test_transformer_long_line_chunked(self, tiny_config):
        engine = FakeEngine(tiny_config, model_type="transformer")
        engine.max_line_width = 400

        class ChunkFake(type(engine)):
            pass

        # Deterministic per-chunk content so the merge is observable.
        calls = []

        def run_ocr(batch_data, widths):
            calls.append(batch_data.shape[0])
            out_t, out_l = [], []
            for i in range(batch_data.shape[0]):
                out_t.append("chunk")
                out_l.append(np.ones((5, 5)))
            return out_t, out_l

        engine.run_ocr = run_ocr
        line = np.zeros((16, 1000, 3), np.uint8)
        t, logits, coords = engine.process_lines([line])
        # 1000px at 400 max width, 100 overlap -> chunks at 0, 300, 600 + tail.
        assert len(t) == 1
        assert "chunk" in t[0]
        assert coords[0] == [0, len(t[0])]


class TestCTCEngineIntegration:
    def test_random_weights_end_to_end(self, tmp_path):
        """Full CTC engine on random weights: shapes, charset with blank,
        sparse logits, logit_coords."""
        import scipy.sparse
        from pero_ocr_tpu.ocr.ctc_engine import CTCEngineLineOCR

        cfg = {
            "characters": list("ab"),
            "line_px_height": 16,
            "line_vertical_scale": 1,
            "checkpoint": "none.ckpt",
            "net_spec": {
                "conv_features": [4, 8],
                "subsampling": 2,
                "lstm_layers": 1,
                "lstm_features": 8,
            },
        }
        p = tmp_path / "ctc.json"
        p.write_text(json.dumps(cfg))
        engine = CTCEngineLineOCR(str(p), batch_size=4)
        assert engine.characters[-1] == "​"

        rng = np.random.default_rng(0)
        lines = [
            rng.integers(0, 255, size=(16, w, 3), dtype=np.uint8)
            for w in (100, 150)
        ]
        transcriptions, logits, coords = engine.process_lines(lines)
        assert len(transcriptions) == 2
        assert all(isinstance(t, str) for t in transcriptions)
        assert scipy.sparse.issparse(logits[0])
        assert logits[0].shape[1] == 3  # a, b, blank
        assert coords[0] == [16, (32 + 100) // 2]


class TestNarrowLabel:
    def test_repeated_run_collapsed_to_best_frame(self):
        from pero_ocr_tpu.ocr.postprocess import narrow_label

        blank = 3
        # frames: a a a b  (a=0, b=1); best 'a' frame is 1.
        logit = np.array([
            [1.0, 0, 0, 0],
            [5.0, 0, 0, 0],
            [2.0, 0, 0, 0],
            [0, 9.0, 0, 0],
        ])
        label = [0, 0, 0, 1]
        out = narrow_label(label, logit, blank)
        assert out == [blank, 0, blank, 1]

    def test_single_frames_unchanged(self):
        from pero_ocr_tpu.ocr.postprocess import narrow_label

        blank = 3
        logit = np.zeros((4, 4))
        label = [0, blank, 1, blank]
        assert narrow_label(label, logit, blank) == [0, blank, 1, blank]

    def test_liberal_fill(self):
        from pero_ocr_tpu.ocr.postprocess import narrow_label

        blank = 3
        logit = np.array([[1.0, 0, 0, 0], [5.0, 0, 0, 0]])
        out = narrow_label([0, 0], logit, blank, on_one_liberal=True)
        assert out == [blank - 1, 0]

    def test_blank_separated_runs_independent(self):
        from pero_ocr_tpu.ocr.postprocess import narrow_label

        blank = 3
        logit = np.array([
            [2.0, 0, 0, 0],
            [1.0, 0, 0, 0],
            [0, 0, 0, 0],
            [1.0, 0, 0, 0],
            [4.0, 0, 0, 0],
        ])
        out = narrow_label([0, 0, blank, 0, 0], logit, blank)
        assert out == [0, blank, blank, blank, 0]


class TestWriterEmbeddings:
    def test_embed_sweep_changes_output_and_table_access(self, tmp_path):
        """Engine with writer embeddings: embedding_table() exposes the
        matrix, and switching embed_id changes logits without recompiling
        (select_embed_id sweep contract)."""
        from pero_ocr_tpu.ocr.ctc_engine import CTCEngineLineOCR

        cfg = {
            "characters": list("ab"),
            "line_px_height": 16,
            "line_vertical_scale": 1,
            "checkpoint": "none.ckpt",
            "embed_num": 4,
            "embed_id": "mean",
            "net_spec": {
                "conv_features": [4, 8],
                "subsampling": 2,
                "lstm_layers": 1,
                "lstm_features": 8,
                "embed_dim": 4,
            },
        }
        p = tmp_path / "embed.json"
        p.write_text(json.dumps(cfg))
        engine = CTCEngineLineOCR(str(p), batch_size=4)

        table = engine.embedding_table()
        assert table.shape == (5, 4)  # embed_num + mean row

        rng = np.random.default_rng(0)
        lines = [rng.integers(0, 255, (16, 64, 3), dtype=np.uint8)]
        assert engine.current_embed_id() == 4  # the mean row

        engine.embed_id = 0
        _, logits0, _ = engine.process_lines(lines)
        engine.embed_id = 1
        _, logits1, _ = engine.process_lines(lines)
        assert not np.allclose(
            logits0[0].todense(), logits1[0].todense()
        )
