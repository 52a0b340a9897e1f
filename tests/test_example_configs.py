"""The shipped example configs (configs/) must construct a full
PageParser (missing model files degrade to random weights with a
warning, never a crash), and the fast-pipeline-compatible ones must
pass the fast-mode feature gate."""

import configparser
import json
import os

import pytest

from pero_ocr_tpu.document.page_parser import PageParser

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")
CONFIGS = sorted(
    f for f in os.listdir(CONFIG_DIR) if f.endswith(".ini")
)


@pytest.fixture(scope="module")
def engine_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("engines")
    (d / "ocr_engine").mkdir()
    (d / "ocr_engine" / "ocr.json").write_text(json.dumps({
        "characters": list("ab "),
        "line_px_height": 16,
        "line_vertical_scale": 1,
        "checkpoint": "none.ckpt",
        "net_spec": {"conv_features": [4, 8], "subsampling": 2,
                     "lstm_layers": 1, "lstm_features": 8},
    }))
    (d / "ocr_engine" / "transformer.json").write_text(json.dumps({
        "characters": list("ab "),
        "line_px_height": 16,
        "line_vertical_scale": 1,
        "checkpoint": "none.ckpt",
        "net_spec": {"conv_features": [4], "subsampling": 2,
                     "d_model": 8, "num_heads": 2, "encoder_layers": 1,
                     "decoder_layers": 1, "mlp_dim": 16,
                     "max_decode_len": 16},
    }))
    return str(d)


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds_page_parser(name, engine_dir, monkeypatch):
    config = configparser.ConfigParser()
    config.read(os.path.join(CONFIG_DIR, name))
    # Shrink the CNN architecture so construction stays fast on CPU.
    for sec in config.sections():
        if config[sec].get("METHOD") == "LAYOUT_CNN":
            config[sec]["BASE_FEATURES"] = "4"
            config[sec]["DEPTH"] = "2"
    parser = PageParser(config, config_path=engine_dir)
    assert parser.run_layout_parser and parser.run_ocr

    if name in ("config2_newspaper_batch.ini", "config5_archive_alto.ini"):
        from pero_ocr_tpu.document.fast_pipeline import FastPagePipeline

        assert FastPagePipeline.unsupported_features(parser) == []
    if name == "config3_beam_lm.ini":
        assert parser.decoder is not None
        import numpy as np

        assert parser.decoder.decoder.transport_dtype == np.float16
