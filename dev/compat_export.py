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

Usage: python3 dev/compat_export.py <outDir>
"""
import sys, os, json, gzip, pickle, base64, types

REF = "/root/reference/integration"


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
    with gzip.open(f"{out_dir}/datasets.jsonl.gz", "wt") as f:
        for name, d in sorted(all_sets.items()):
            row = {
                "name": name,
                "create": d["hash creates"],
                "sets": [{"key": k, "fields": {fn: tag(fv) for fn, fv in fields.items()}}
                         for (k, fields) in d["hash sets"]],
            }
            f.write(json.dumps(row) + "\n")
    print(f"datasets: {len(all_sets)}")

    # ---- answers (dedup per (schema_type, cmd); HASH only) ----
    def load(n):
        with gzip.open(f"{REF}/compatibility/{n}.pickle.gz") as f:
            return pickle.load(f)["answers"]

    for src, fname in (("aggregate-answers", "answers_agg"),
                       ("text-search-answers", "answers_text")):
        seen = {}
        skipped = 0
        for a in load(src):
            if a["key_type"] != "hash":
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
