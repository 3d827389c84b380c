#!/usr/bin/env python3
"""Export the reference's compatibility corpus (datasets + pickled
golden answers) as JSONL fixtures for CompatCorpusSpec.

Dev-only tool (driver-side python, like oracle_check.py): the corpus
lives as python code + pickles in the PUBLIC reference repo
(integration/compatibility/{data_sets.py, generate.py,
*-answers.pickle.gz}); this converts it losslessly to JSON the Scala
spec can read with spark.read.json. HASH-key entries only (the
engine's document model; the corpus' JSON replies return raw `$` JSON
documents — a reply surface we don't serve).

Value encoding (lossless, byte-exact):
  {"i": n}      int
  {"d": x}      float
  {"s": "..."}  str
  {"b64": ...}  bytes
  {"a": [...]}  list
  {"z": true}   None

Round 14: the JSON half exports too. Datasets gain `json_create` +
`json_docs` (key → the document as the JSON module would serialize it
back: compact separators, raw UTF-8 — validated byte-for-byte against
every `$` document the golden replies actually recorded), and the
answers export as answers_{agg,text}_json.jsonl.gz with the same
dedup. The engine serves these via `FT.CREATE ... ON JSON` replying
the serialized doc under `$` (attribute_data_type.h:117-135).

Usage: python3 dev/compat_export.py <outDir>
"""
import sys, os, json, gzip, pickle, base64, types

REF = "/root/reference/integration"


def serialize_doc(fields):
    """The stored document as valkey-json re-serializes it on
    JSON.GET (compact separators, raw UTF-8, standard escapes) —
    validated against every golden-recorded `$` reply in main()."""
    return json.dumps(fields, ensure_ascii=False, separators=(",", ":"))


def tag(v):
    if v is None:
        return {"z": True}
    if isinstance(v, bool):
        return {"i": int(v)}
    if isinstance(v, int):
        return {"i": v}
    if isinstance(v, float):
        import math
        if math.isinf(v):
            return {"ds": "inf" if v > 0 else "-inf"}
        if math.isnan(v):
            return {"ds": "nan"}
        return {"d": v}
    if isinstance(v, bytes):
        try:
            s = v.decode("utf-8")
            # round-trippable as text?
            if s.encode("utf-8") == v:
                return {"s": s}
        except UnicodeDecodeError:
            pass
        return {"b64": base64.b64encode(v).decode("ascii")}
    if isinstance(v, str):
        return {"s": v}
    if isinstance(v, (list, tuple)):
        return {"a": [tag(x) for x in v]}
    if isinstance(v, dict):
        # the reference client decodes some empty-array replies as {}
        return {"m": [[tag(k), tag(x)] for k, x in v.items()]}
    raise TypeError(f"untaggable {type(v)}: {v!r}")


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    # data_sets imports valkey only for its client helpers; stub it
    try:
        import valkey  # noqa: F401
    except ImportError:
        sys.modules["valkey"] = types.ModuleType("valkey")
    sys.path.insert(0, REF)
    from compatibility import data_sets as ds

    # ---- datasets (deterministic: itertools + seeded random) ----
    all_sets = ds.compute_data_sets()
    for name in ("pure text", "punctuation"):
        for st in ("default", "nostem"):
            d = ds.compute_text_data_sets(name, schema_type=st)[name]
            all_sets[f"{name}|{st}"] = d
    def load(n):
        with gzip.open(f"{REF}/compatibility/{n}.pickle.gz") as f:
            data = pickle.load(f)
        # expr-answers is a bare list; the others wrap in {"answers": …}
        return data["answers"] if isinstance(data, dict) else data

    # ---- golden `$` documents: validate serialize_doc byte-for-byte
    # against every serialized document a golden reply recorded ----
    golden_docs = {}  # (ds_name, schema_type, key) -> set(doc bytes)
    for src in ("aggregate-answers", "text-search-answers", "expr-answers"):
        for a in load(src):
            if a["key_type"] != "json" or "result" not in a:
                continue
            r = a["result"]
            if not isinstance(r, list):
                continue
            i = 1
            while i + 1 < len(r):
                k, v = r[i], r[i + 1]
                if isinstance(k, bytes) and isinstance(v, list):
                    # search shape: key, [field, value, ...]
                    for j in range(0, len(v) - 1, 2):
                        if v[j] == b"$":
                            golden_docs.setdefault(
                                (a["data_set_name"], a.get("schema_type"), k),
                                set()).add(v[j + 1])
                elif isinstance(k, list):
                    # aggregate shape: [field, value, ...] rows without a
                    # key — validate doc-set membership (key = None)
                    for j in range(0, len(k) - 1, 2):
                        if k[j] == b"$":
                            golden_docs.setdefault(
                                (a["data_set_name"], a.get("schema_type"), None),
                                set()).add(k[j + 1])
                    i -= 1  # rows are single elements, not pairs
                i += 2

    validated, mismatched = 0, 0
    with gzip.open(f"{out_dir}/datasets.jsonl.gz", "wt") as f:
        for name, d in sorted(all_sets.items()):
            base, _, st = name.partition("|")
            json_docs = []
            for (k, fields) in d.get("json sets", []):
                doc = serialize_doc(fields)
                goldens = golden_docs.get((base, st or None, k.encode()))
                if goldens:
                    if doc.encode("utf-8") in goldens and len(goldens) == 1:
                        validated += 1
                    else:
                        mismatched += 1
                        print(f"DOC MISMATCH {name} {k}:\n  ours   {doc!r}\n"
                              f"  golden {goldens!r}")
                json_docs.append({"key": k, "doc": doc})
            # keyless (aggregate-row) golden docs: set membership
            ours = {jd["doc"].encode("utf-8") for jd in json_docs}
            for g in golden_docs.get((base, st or None, None), set()):
                if g in ours:
                    validated += 1
                else:
                    mismatched += 1
                    print(f"DOC MISMATCH (keyless) {name}: golden {g!r}")
            row = {
                "name": name,
                "create": d["hash creates"],
                "sets": [{"key": k, "fields": {fn: tag(fv) for fn, fv in fields.items()}}
                         for (k, fields) in d["hash sets"]],
                "json_create": d.get("json creates", []),
                "json_docs": json_docs,
            }
            f.write(json.dumps(row) + "\n")
    print(f"datasets: {len(all_sets)}; json docs validated {validated} "
          f"against goldens, {mismatched} mismatched")
    assert mismatched == 0, "serialize_doc diverges from the module's serializer"

    # ---- answers (dedup per (schema_type, cmd); per key_type) ----
    for src, key_type, fname in (
            ("aggregate-answers", "hash", "answers_agg"),
            ("text-search-answers", "hash", "answers_text"),
            ("aggregate-answers", "json", "answers_agg_json"),
            ("text-search-answers", "json", "answers_text_json"),
            # the expression corpus (generate_expr.py) is recorded
            # against the JSON model only
            ("expr-answers", "json", "answers_expr_json")):
        seen = {}
        skipped = 0
        for a in load(src):
            if a["key_type"] != key_type:
                continue
            k = (a.get("schema_type"), repr(a["cmd"]))
            if k in seen:
                continue
            if "result" not in a:
                skipped += 1
                continue
            seen[k] = a
        with gzip.open(f"{out_dir}/{fname}.jsonl.gz", "wt") as f:
            for a in seen.values():
                f.write(json.dumps({
                    "ds": a["data_set_name"],
                    "schema_type": a.get("schema_type"),
                    "testname": a["testname"],
                    "cmd": [tag(t) for t in a["cmd"]],
                    "result": tag(a["result"]),
                    "exc": bool(a.get("exception")),
                }) + "\n")
        print(f"{fname}: {len(seen)} (skipped {skipped} without result)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/compat")
