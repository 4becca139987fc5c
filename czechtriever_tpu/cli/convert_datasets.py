"""Dataset -> BEIR-format converters
(reference data_scripts/convertmrtydi2beir.py, parse_dareczech.py,
create_beir_dataset.py).

Subcommands:
  * ``mrtydi``   — Mr.TyDi layout (topic.tsv, collection/docs.jsonl,
    qrels.{train,dev,test}.txt TREC files) -> corpus.jsonl +
    queries.jsonl + qrels/<split>.tsv.
  * ``dareczech`` — DAREczech TSV (id-indexed rows with query, title,
    doc, label) -> BEIR with 2x-label scores and one query per unique
    query text.
  * ``annotations`` — card-annotation dumps (jsonl records with a
    query_string and cards carrying segments_cz text + a
    positive/neutral/negative state) -> the fit-eval-style BEIR set
    (create_beir_dataset.py:34-184). Cross-annotator label conflicts are
    resolved by --conflicts {first,positive,negative} instead of the
    reference's hard-coded hand-resolution table (:17-33).

Usage:
  python -m czechtriever_tpu.cli.convert_datasets mrtydi IN_DIR OUT_DIR
  python -m czechtriever_tpu.cli.convert_datasets dareczech \\
      --input_file dev.tsv --output_dir beir/dareczech
  python -m czechtriever_tpu.cli.convert_datasets annotations \\
      --data_folder dumps/ --output_dir beir/fit-eval
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys


def convert_mrtydi(data_path: str, output_path: str) -> None:
    """convertmrtydi2beir.py:8-55 parity."""
    os.makedirs(output_path, exist_ok=True)
    with open(os.path.join(output_path, "queries.jsonl"), "w",
              encoding="utf-8") as fout, \
            open(os.path.join(data_path, "topic.tsv"), encoding="utf-8") as fin:
        for x in csv.reader(fin, delimiter="\t"):
            json.dump({"_id": x[0], "text": x[1]}, fout, ensure_ascii=False)
            fout.write("\n")

    with open(os.path.join(data_path, "collection", "docs.jsonl"),
              encoding="utf-8") as fin, \
            open(os.path.join(output_path, "corpus.jsonl"), "w",
                 encoding="utf-8") as fout:
        for line in fin:
            x = json.loads(line)
            x["_id"] = x.pop("id")
            x["text"] = x.pop("contents")
            x["title"] = ""
            json.dump(x, fout, ensure_ascii=False)
            fout.write("\n")

    os.makedirs(os.path.join(output_path, "qrels"), exist_ok=True)
    for split in ("test", "dev", "train"):
        src = os.path.join(data_path, f"qrels.{split}.txt")
        if not os.path.exists(src):
            continue
        with open(src, encoding="utf-8") as fin, \
                open(os.path.join(output_path, "qrels", f"{split}.tsv"),
                     "w", encoding="utf-8", newline="") as fout:
            writer = csv.writer(fout, delimiter="\t")
            writer.writerow(["query-id", "corpus-id", "score"])
            for line in fin:
                el = line.strip().split()  # TREC: qid iter docid score
                writer.writerow([el[0], el[2], el[3]])


def convert_dareczech(input_file: str, output_dir: str) -> None:
    """parse_dareczech.py parity, without the pandas dependency: the TSV
    is id-indexed with columns query/title/doc/label; scores are
    2*label rounded to int; one query id per unique query text."""
    os.makedirs(os.path.join(output_dir, "qrels"), exist_ok=True)
    rows = []
    with open(input_file, encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t")
        id_col = reader.fieldnames[0]
        for r in reader:
            rows.append(r)

    with open(os.path.join(output_dir, "corpus.jsonl"), "w",
              encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps({
                "_id": r[id_col],
                "title": r.get("title") or "",
                "text": str(r["doc"]),
            }, ensure_ascii=False) + "\n")

    queries = {}
    with open(os.path.join(output_dir, "queries.jsonl"), "w",
              encoding="utf-8") as f:
        for r in rows:
            text = str(r["query"])
            if text in queries:
                continue
            qid = "q" + r[id_col]
            queries[text] = qid
            f.write(json.dumps({"_id": qid, "text": text},
                               ensure_ascii=False) + "\n")

    with open(os.path.join(output_dir, "qrels", "test.tsv"), "w",
              encoding="utf-8") as f:
        f.write("query_id\tdoc_id\tscore\n")
        for r in rows:
            qid = queries[str(r["query"])]
            score = str(int(2 * float(r["label"])))
            f.write(f"{qid}\t{r[id_col]}\t{score}\n")


def convert_annotations(data_folder: str, output_dir: str,
                        conflicts: str = "first") -> None:
    """create_beir_dataset.py parity: merge per-user card annotations
    into a BEIR corpus/queries/qrels triple.

    Record filter (:45-56): at least one card with a timestamp and a
    non-neutral state, and a ``query_string`` (asymmetric queries only).
    Docs are deduplicated across queries by exact text with STABLE ids
    (the reference advances its doc counter on duplicates, so a doc
    first seen after any duplicate gets an id that later re-references
    point past — ids here are d<insertion-index>). Scores: positive=2,
    else 0 (:141-150, the intermediate 3-way score is dead code there).

    Ordering divergence vs the reference: annotations merge in sorted
    filename/line order, while create_beir_dataset.py groups per-user
    first — so with ``conflicts="first"`` the winning label for a
    (query, doc) pair annotated by multiple users, and the doc-id/query
    emission order, can differ from the reference's output for the same
    dumps. Diffs against reference-built eval sets are expected at
    exactly those conflicting pairs.
    """
    per_query = {}  # query_string -> {doc_text: (label, author)}
    order = []
    for fname in sorted(os.listdir(data_folder)):
        path = os.path.join(data_folder, fname)
        if not os.path.isfile(path):
            continue
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                record = json.loads(line)
                if "query_string" not in record:
                    continue
                cards = [c for c in record.get("data", {}).get("cards", [])
                         if c.get("timestamp") and "segments_cz" in c
                         and c.get("state") in ("positive", "negative")]
                if not cards:
                    continue
                query = record["query_string"]
                if query not in per_query:
                    per_query[query] = {}
                    order.append(query)
                user = record.get("user", "")
                for card in cards:
                    doc, label = card["segments_cz"], card["state"]
                    if doc not in per_query[query]:
                        per_query[query][doc] = (label, user)
                    elif per_query[query][doc][0] != label:
                        prev_label, prev_user = per_query[query][doc]
                        print(f"conflict on query {query!r}: "
                              f"{prev_user}={prev_label} vs {user}={label}"
                              f" -> policy {conflicts}", file=sys.stderr)
                        if conflicts in ("positive", "negative"):
                            per_query[query][doc] = (conflicts, user)
                        # "first": keep the existing annotation

    corpus = {}          # doc text -> doc id
    os.makedirs(os.path.join(output_dir, "qrels"), exist_ok=True)
    with open(os.path.join(output_dir, "queries.jsonl"), "w",
              encoding="utf-8") as qf, \
            open(os.path.join(output_dir, "qrels", "test.tsv"), "w",
                 encoding="utf-8") as rf:
        rf.write("query_id\tdoc_id\tscore\n")
        for qi, query in enumerate(order):
            qid = f"q{qi}"
            qf.write(json.dumps({"_id": qid, "text": query},
                                ensure_ascii=True) + "\n")
            for doc, (label, _user) in per_query[query].items():
                if doc not in corpus:
                    corpus[doc] = f"d{len(corpus)}"
                score = 2 if label == "positive" else 0
                rf.write(f"{qid}\t{corpus[doc]}\t{score}\n")

    with open(os.path.join(output_dir, "corpus.jsonl"), "w",
              encoding="utf-8") as cf:
        for doc, did in corpus.items():
            cf.write(json.dumps({"_id": did, "title": "", "text": doc},
                                ensure_ascii=True) + "\n")


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("mrtydi")
    m.add_argument("data_path")
    m.add_argument("output_path")
    d = sub.add_parser("dareczech")
    d.add_argument("--input_file", required=True)
    d.add_argument("--output_dir", required=True)
    a = sub.add_parser("annotations")
    a.add_argument("--data_folder", required=True)
    a.add_argument("--output_dir", required=True)
    a.add_argument("--conflicts", default="first",
                   choices=("first", "positive", "negative"))
    args = p.parse_args(argv)
    if args.cmd == "mrtydi":
        convert_mrtydi(args.data_path, args.output_path)
    elif args.cmd == "annotations":
        convert_annotations(args.data_folder, args.output_dir,
                            args.conflicts)
    else:
        convert_dareczech(args.input_file, args.output_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
