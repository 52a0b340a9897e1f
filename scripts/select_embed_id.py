#!/usr/bin/env python3
"""Pick the best writer/style embedding id for a multi-embedding OCR net:
k-means over the embedding table, per-representative CER sweep on sample
lines, winner written back into the OCR JSON
(reference: user_scripts/select_embed_id.py:44-129)."""

import argparse
import configparser
import json
import os
import random
import sys
import time

import cv2
import numpy as np
from sklearn.cluster import KMeans

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pero_ocr_tpu.core.layout import PageLayout
from pero_ocr_tpu.document.page_parser import PageParser
from pero_ocr_tpu.sequence_alignment import levenshtein_distance
from pero_ocr_tpu.utils.paths import compose_path


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-i", "--input-image-path")
    parser.add_argument("-x", "--input-xml-path")
    parser.add_argument("-l", "--input-lmdb-path")
    parser.add_argument("-t", "--input-data-path")
    parser.add_argument("-b", "--batch-size", type=int, default=32)
    parser.add_argument("--n-clusters", type=int, default=100)
    parser.add_argument("--n-lines", type=int, default=100)
    parser.add_argument("--mean-cluster-embed", action="store_true")
    parser.add_argument("--representative-embed-ids", type=str,
                        help="Comma-separated; skips clustering.")
    parser.add_argument("--out", type=str)
    parser.add_argument("--allow-random-weights", action="store_true",
                        help="Run with RANDOM weights when a configured "
                             "checkpoint is missing (test/CI use).")
    return parser.parse_args()


def select_representative_embeddings(
    ocr_engine, n_clusters, mean_cluster_embedding=False
):
    embeddings = ocr_engine.embedding_table()
    print(f"EMBEDDINGS SHAPE: {embeddings.shape}")
    kmeans = KMeans(n_clusters=n_clusters, random_state=0).fit(embeddings)
    out = []
    for i in range(n_clusters):
        members = np.where(kmeans.labels_ == i)[0]
        if len(members) == 0:
            continue
        if mean_cluster_embedding:
            center = embeddings[members].mean(axis=0)
            out.append(
                int(members[np.argmin(
                    np.linalg.norm(embeddings[members] - center, axis=1)
                )])
            )
        else:
            out.append(int(np.random.choice(members)))
    return out


def crops_from_images_and_xmls(page_parser, image_path, xml_path, n_lines):
    ignored = {"", ".xml", ".logits"}
    images = sorted(
        f for f in os.listdir(image_path)
        if os.path.splitext(f)[1].lower() not in ignored
    )
    crops, gts = [], []
    for image_file in images:
        if len(crops) >= n_lines:
            break
        file_id = os.path.splitext(image_file)[0]
        xml_file = os.path.join(xml_path, file_id + ".xml")
        if not os.path.exists(xml_file):
            continue
        image = cv2.imread(os.path.join(image_path, image_file), 1)
        if image is None:
            continue
        layout = PageLayout(file=xml_file)
        page_parser.line_cropper.process_page(image, layout)
        for line in layout.lines_iterator():
            if line.transcription and line.crop is not None:
                crops.append(line.crop.astype(np.uint8))
                gts.append(line.transcription)
                if len(crops) >= n_lines:
                    break
    return crops, gts


def crops_from_lmdb(lmdb_path, data_path, n_lines):
    import lmdb  # gated optional dependency

    from pero_ocr_tpu.transcription_io import parse_transcription_line

    env = lmdb.open(lmdb_path, readonly=True, lock=False)
    crops, gts = [], []
    with open(data_path, encoding="utf-8") as f:
        entries = [parse_transcription_line(l) for l in f if l.strip()]
    random.shuffle(entries)
    with env.begin() as txn:
        for key, _, text in entries[: n_lines * 2]:
            data = txn.get(key.encode())
            if data is None:
                continue
            img = cv2.imdecode(np.frombuffer(data, np.uint8), 1)
            if img is None:
                continue
            crops.append(img)
            gts.append(text)
            if len(crops) >= n_lines:
                break
    return crops, gts


def main():
    args = parse_arguments()
    config = configparser.ConfigParser()
    config.read(args.config)

    if not args.allow_random_weights:
        from pero_ocr_tpu.utils.checkpoint import set_strict_loading

        set_strict_loading(True)

    page_parser = PageParser(config, config_path=os.path.dirname(args.config))
    engine = page_parser.ocr.ocr_engine
    engine.batch_size = args.batch_size

    if args.input_image_path is not None and args.input_xml_path is not None:
        line_crops, gts = crops_from_images_and_xmls(
            page_parser, args.input_image_path, args.input_xml_path, args.n_lines
        )
    elif args.input_lmdb_path is not None and args.input_data_path is not None:
        line_crops, gts = crops_from_lmdb(
            args.input_lmdb_path, args.input_data_path, args.n_lines
        )
    else:
        print("Invalid inputs.")
        sys.exit(-1)

    t_start = time.time()
    if args.representative_embed_ids is not None:
        representatives = [
            int(x) for x in args.representative_embed_ids.split(",")
        ]
    elif args.n_clusters < (engine.embed_num or 0):
        representatives = select_representative_embeddings(
            engine, args.n_clusters, args.mean_cluster_embed
        )
    else:
        representatives = list(range(engine.embed_num or 1))
    print("REPRESENTATIVE EMBEDDING IDS: "
          + ",".join(str(x) for x in representatives))
    print()

    cers = []
    for embed_id in representatives:
        engine.embed_id = embed_id
        t1 = time.time()
        transcriptions, _, _ = engine.process_lines(line_crops, no_logits=True)
        if args.out is not None:
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(args.out, f"{embed_id}.gt"), "w") as f:
                f.writelines(f"{x}\n" for x in gts)
            with open(os.path.join(args.out, f"{embed_id}.trans"), "w") as f:
                f.writelines(f"{x}\n" for x in transcriptions)
        char_sum = sum(len(gt) for gt in gts)
        char_dist = sum(
            int(levenshtein_distance(list(gt), list(t)))
            for gt, t in zip(gts, transcriptions)
        )
        if char_sum > 0:
            cers.append(100.0 * char_dist / char_sum)
            print(f"{embed_id} {cers[-1]:.2f} % CER [ {char_dist} / "
                  f"{char_sum} ] Time: {time.time() - t1:.2f}")
        else:
            cers.append(1e12)
            print(f"{embed_id} N/A % CER [ {char_dist} / {char_sum} ] "
                  f"Time: {time.time() - t1:.2f}")

    best = representatives[int(np.argmin(cers))]
    print()
    print(f"SELECTED EMBED ID WITH MIN CER: {best}")
    print(f"PROCESSING TIME {time.time() - t_start}")

    engine.config["embed_id"] = str(best)
    with open(
        compose_path(config["OCR"]["OCR_JSON"], os.path.dirname(args.config)),
        "w", encoding="utf8",
    ) as f:
        json.dump(engine.config, f, indent=4)


if __name__ == "__main__":
    main()
