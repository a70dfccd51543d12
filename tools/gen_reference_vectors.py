"""Generate pinned test vectors by running the ACTUAL reference functions
(data_utils.py directly; parse_matrix_spots extracted from decode.py without
the torch import). Output: src/test/resources/refvec/*.json
Deterministic (seeded). Run manually; outputs are committed.
"""
import json, random, sys, os, re
import importlib.util
spec = importlib.util.spec_from_file_location("data_utils", "/root/reference/data/data_utils.py")
du = importlib.util.module_from_spec(spec); spec.loader.exec_module(du)
sort_boxes, string_f2h, normalize_bbox = du.sort_boxes, du.string_f2h, du.normalize_bbox
merge_bbox, box_two_point_convert = du.merge_bbox, du.box_two_point_convert

# extract parse_matrix_spots source without importing torch
src = open("/root/reference/pipeline/decode.py").read()
m = re.search(r"def parse_matrix_spots.*?\n    return spot_map\n", src, re.S)
ns = {"Dict": dict, "List": list, "Tuple": tuple}
exec(compile(m.group(0), "parse_matrix_spots", "exec"), ns)
parse_matrix_spots = ns["parse_matrix_spots"]

rng = random.Random(20260816)
out = {}

# --- sort_boxes vectors ---
sb_cases = []
for n in [1, 2, 3, 5, 8, 13, 30]:
    for trial in range(4):
        boxes = []
        for _ in range(n):
            l = rng.randint(0, 900); t = rng.randint(0, 1300)
            w = rng.randint(5, 300); h = rng.randint(5, 60)
            boxes.append([l, t, l + w, t + h])
        # dedupe exact center ties to sidestep numpy unstable-sort ambiguity
        seen = set(); ok = []
        for b in boxes:
            cy = (b[1]+b[3]) / 2.0; cx = (b[0]+b[2]) / 2.0
            if (cx, cy) in seen: continue
            seen.add((cx, cy)); ok.append(b)
        sb_cases.append({"boxes": ok, "perm": sort_boxes(ok)})
out["sort_boxes"] = sb_cases

# --- string_f2h vectors ---
texts = ["", "abc", "ＡＢＣ！ １２３", "　x　", "mixed＋fulｌwidth～", "！～｟", "no change 123"]
out["string_f2h"] = [{"in": t, "out": string_f2h(t)} for t in texts]

# --- normalize_bbox ---
nb = []
for _ in range(30):
    w = rng.randint(100, 2000); h = rng.randint(100, 2000)
    x0 = rng.randint(0, w - 2); x1 = rng.randint(x0, w)
    y0 = rng.randint(0, h - 2); y1 = rng.randint(y0, h)
    nb.append({"box": [x0, y0, x1, y1], "w": w, "h": h,
               "out": normalize_bbox([x0, y0, x1, y1], (w, h))})
out["normalize_bbox"] = nb

# --- merge_bbox ---
mb = []
for _ in range(10):
    bl = [[rng.randint(0,500), rng.randint(0,500), rng.randint(500,1000), rng.randint(500,1000)] for _ in range(rng.randint(1,6))]
    mb.append({"boxes": bl, "out": merge_bbox(bl)})
out["merge_bbox"] = mb

# --- parse_matrix_spots: adversarial score-tie + shared-head/tail cases ---
pm = []
def spots_case(spots, top, triu, thresh=0.0):
    r = parse_matrix_spots([tuple(s) for s in spots], top_score_only=top, triu_mode=triu, score_thresh=thresh)
    # multi-map values are lists; top map values ints. Render as ordered pairs.
    items = [[k, v if isinstance(v, list) else v] for k, v in r.items()]
    return {"spots": spots, "top": top, "triu": triu, "thresh": thresh, "result": items}
for trial in range(60):
    L = rng.randint(2, 12)
    ns_ = rng.randint(1, 15)
    spots = []
    for _ in range(ns_):
        i = rng.randint(0, L - 1); j = rng.randint(i, L - 1)
        tag = rng.choice([1, 1, 1, 2])
        score = rng.choice([0.5, 0.7, 0.7, 0.9, 1.0])  # deliberate ties
        spots.append([i, j, tag, score])
    pm.append(spots_case(spots, top=bool(trial % 2), triu=bool((trial // 2) % 2),
                         thresh=rng.choice([0.0, 0.0, 0.6])))
# hand adversarial: shared heads and tails, all score 1.0 (our engine's regime)
pm.append(spots_case([[0,3,1,1.0],[0,5,1,1.0],[1,3,1,1.0],[2,5,2,1.0]], True, True))
pm.append(spots_case([[0,3,1,1.0],[0,5,1,1.0],[1,3,1,1.0],[2,5,2,1.0]], False, True))
out["parse_matrix_spots"] = pm

os.makedirs("/root/repo/src/test/resources/refvec", exist_ok=True)
with open("/root/repo/src/test/resources/refvec/vectors.json", "w") as f:
    json.dump(out, f)
print("cases:", {k: len(v) for k, v in out.items()})
