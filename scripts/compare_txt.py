#!/usr/bin/env python3
"""CER/WER between ground-truth and hypothesis txt folders -> CSV
(reference: user_scripts/compare_txt.py)."""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pero_ocr_tpu.sequence_alignment import levenshtein_distance


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Compute CER and WER between GT and hypothesis txt files."
    )
    parser.add_argument("--gt", required=True, help="GT txt directory.")
    parser.add_argument("--hyp", required=True, help="Hypothesis txt directory.")
    parser.add_argument("--output", required=True, help="Output CSV path.")
    parser.add_argument("--encoding", default="utf-8")
    return parser.parse_args()


def read_text(path, encoding):
    try:
        with open(path, "r", encoding=encoding) as f:
            return f.read()
    except Exception as e:
        print(f"Warning: could not read '{path}': {e}", file=sys.stderr)
        return None


def normalize_whitespace(text):
    return " ".join(text.split())


def compute_cer(gt_text, hyp_text):
    gt = normalize_whitespace(gt_text)
    hyp = normalize_whitespace(hyp_text)
    n = len(gt)
    if n == 0:
        return 0.0, 0
    return float(levenshtein_distance(list(gt), list(hyp))) / n, n


def compute_wer(gt_text, hyp_text):
    gt = normalize_whitespace(gt_text).split()
    hyp = normalize_whitespace(hyp_text).split()
    n = len(gt)
    if n == 0:
        return 0.0, 0
    return float(levenshtein_distance(gt, hyp)) / n, n


def main():
    args = parse_arguments()
    gt_files = {f for f in os.listdir(args.gt) if f.lower().endswith(".txt")}
    hyp_files = {f for f in os.listdir(args.hyp) if f.lower().endswith(".txt")}
    all_files = sorted(gt_files | hyp_files)
    if not all_files:
        print("No txt files found in the provided directories.", file=sys.stderr)
        sys.exit(1)

    rows = []
    for filename in all_files:
        gt_path = os.path.join(args.gt, filename)
        hyp_path = os.path.join(args.hyp, filename)
        if not os.path.exists(gt_path):
            print(f"Warning: '{filename}' missing in GT directory, skipping.",
                  file=sys.stderr)
            continue
        if not os.path.exists(hyp_path):
            print(f"Warning: '{filename}' missing in hypothesis directory, "
                  f"skipping.", file=sys.stderr)
            continue
        gt_text = read_text(gt_path, args.encoding)
        hyp_text = read_text(hyp_path, args.encoding)
        if gt_text is None or hyp_text is None:
            continue
        cer, n_chars = compute_cer(gt_text, hyp_text)
        wer, n_words = compute_wer(gt_text, hyp_text)
        rows.append({
            "file_name": filename,
            "cer": f"{cer:.6f}",
            "wer": f"{wer:.6f}",
            "number_of_gt_characters": n_chars,
            "number_of_gt_words": n_words,
        })

    with open(args.output, "w", newline="", encoding="utf-8") as csvfile:
        writer = csv.DictWriter(csvfile, fieldnames=[
            "file_name", "cer", "wer",
            "number_of_gt_characters", "number_of_gt_words",
        ])
        writer.writeheader()
        writer.writerows(rows)

    print(f"\nResults written to '{args.output}' ({len(rows)} files processed).")

    total_chars = sum(int(r["number_of_gt_characters"]) for r in rows)
    total_words = sum(int(r["number_of_gt_words"]) for r in rows)
    if total_chars > 0:
        avg_cer = sum(
            float(r["cer"]) * int(r["number_of_gt_characters"]) for r in rows
        ) / total_chars
        print(f"Overall CER (weighted): {avg_cer * 100:.2f} %")
    if total_words > 0:
        avg_wer = sum(
            float(r["wer"]) * int(r["number_of_gt_words"]) for r in rows
        ) / total_words
        print(f"Overall WER (weighted): {avg_wer * 100:.2f} %")


if __name__ == "__main__":
    main()
