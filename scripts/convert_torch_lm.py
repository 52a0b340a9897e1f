#!/usr/bin/env python3
"""Convert a torch char-LSTM language model checkpoint to the framework's
LM format (msgpack flax variables + JSON sidecar spec).

The converted file plugs straight into the ``[DECODER] LM`` config key
(both the host FAST-LOG-RAW decoder and TPU-BEAM).  Gate mapping is
verified numerically in tests/test_convert_torch.py.

Usage:
  python scripts/convert_torch_lm.py model.pt out.lm \
      --embed-prefix embed --lstm-prefix lstm --head-prefix head
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("torch_checkpoint", help=".pt state dict or module")
    parser.add_argument("output", help="output LM path (msgpack)")
    parser.add_argument("--embed-prefix", default="embed")
    parser.add_argument("--lstm-prefix", default="lstm")
    parser.add_argument("--head-prefix", default="head")
    parser.add_argument("--vocab-json", default=None,
                        help="optional JSON list of LM vocabulary chars")
    args = parser.parse_args()

    import torch

    obj = torch.load(args.torch_checkpoint, map_location="cpu",
                     weights_only=False)
    state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj

    from pero_ocr_tpu.utils.convert_torch import (
        convert_torch_lm,
        lm_spec_from_variables,
    )
    from pero_ocr_tpu.utils.checkpoint import save_variables

    variables = convert_torch_lm(
        state_dict,
        embed_prefix=args.embed_prefix,
        lstm_prefix=args.lstm_prefix,
        head_prefix=args.head_prefix,
    )
    sidecar = lm_spec_from_variables(variables)
    save_variables(variables, args.output)
    if args.vocab_json:
        with open(args.vocab_json, encoding="utf8") as f:
            chars = json.load(f)
        sidecar["vocab"] = {c: i for i, c in enumerate(chars)}
    with open(args.output + ".json", "w", encoding="utf8") as f:
        json.dump(sidecar, f)
    print(
        "converted: vocab={vocab_size} embed={embed_dim} "
        "hidden={hidden_dim} layers={num_layers} -> ".format(**sidecar)
        + args.output
    )


if __name__ == "__main__":
    main()
