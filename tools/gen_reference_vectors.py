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

# --- special_text_replace (deploy/inference.py:182-203 variant, the
# superset the engine ports): extract the method source and exec with
# string_f2h bound; call with a dummy self ---
isrc = open("/root/reference/deploy/inference.py").read()
mi = re.search(r"    def _special_text_replace.*?\n        return string_f2h\(line_text\)\n", isrc, re.S)
ns_sr = {"string_f2h": string_f2h}
exec(compile("class _D:\n" + mi.group(0), "str_repl", "exec"), ns_sr)
_special = ns_sr["_D"]()._special_text_replace
sr_texts = [
    "", "plain", "☐ tick ☑ box", "\uf702x\uf703", "Tοpic: Tοpic",
    "café – menú", "‘quoted’ “open", "em—dash ™ §5 ¢99",
    "ü over ú", "ＦＵＬＬ　ｗｉｄｔｈ！ plus – mixed ™",
    "áéíóúü–‘’“—™§¢ all at once", "Tοpics stay (only exact Tοpic)",
]
out["special_text_replace"] = [{"in": t, "out": _special(t)} for t in sr_texts]

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

# --- box_two_point_convert: 4-value passthrough + 8-value quad path ---
btc = []
for _ in range(12):
    b4 = [rng.randint(-50, 900) for _ in range(4)]
    btc.append({"box": b4, "out": box_two_point_convert(b4)})
for _ in range(20):
    # quads: rotated/skewed, duplicate coords, negatives
    b8 = [rng.choice([rng.randint(-100, 1500), rng.randint(0, 10)]) for _ in range(8)]
    if rng.random() < 0.3:
        b8[2], b8[4] = b8[0], b8[6]  # duplicated x coords (set-dedup path)
    btc.append({"box": b8, "out": box_two_point_convert(b8)})
out["box_two_point_convert"] = btc

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

# --- sample_decode_peneo: execute the FULL reference decode chain ---
# (decode.py:72-378). Extract the function source and exec it with:
#   * torch stripped (only referenced in annotations -> dummy namespace),
#   * the real merge_bbox from data_utils,
#   * a pass-through tagger whose get_spots_from_shaking_tag returns the
#     given spot list verbatim (the shaking<->spots round trip is pinned
#     separately by the parse_matrix_spots + canonicalize vectors; these
#     vectors pin the chain walk / validation / strip / box-merge logic).
import types
m2 = re.search(r"def sample_decode_peneo.*", src, re.S)
ns2 = {
    "Dict": dict, "List": list, "Tuple": tuple,
    "torch": types.SimpleNamespace(Tensor=object),
    "HandshakingTaggingScheme": object,
    "merge_bbox": merge_bbox,
    "parse_matrix_spots": parse_matrix_spots,
}
exec(compile(m2.group(0), "sample_decode_peneo", "exec"), ns2)
sample_decode_peneo = ns2["sample_decode_peneo"]

class SpotTagger:
    @staticmethod
    def get_spots_from_shaking_tag(shaking_tag, shaking_ind2matrix_ind=None, seq_len=None):
        return [tuple(s) for s in shaking_tag]

class BoxList(list):
    def tolist(self):
        return [list(b) for b in self]

def run_decode(case):
    r = sample_decode_peneo(
        handshaking_tagger=SpotTagger,
        text=case["text"],
        line_extraction_shaking=case["le"],
        ent_linking_h2h_shaking=case["eh"],
        ent_linking_t2t_shaking=case["et"],
        line_grouping_h2h_shaking=case["gh"],
        line_grouping_t2t_shaking=case["gtl"],
        bbox=BoxList(case["bbox"]),
        shaking_ind2matrix_ind=[],  # unused by the pass-through tagger
        decode_gt=case["gt"],
        score_thresh=case["thresh"],
    )
    kv, lines, le_map, eh_map, et_map, gh_map, gt_map = r
    case["kv"] = [[k, v, list(kb), list(vb)] for (k, v, kb, vb) in kv]
    case["lines"] = [[t, list(b)] for (t, b) in lines]
    case["le_map"] = [[k, v] for k, v in le_map.items()]
    case["eh_map"] = [[k, list(v)] for k, v in eh_map.items()]
    case["et_map"] = [[k, list(v)] for k, v in et_map.items()]
    case["gh_map"] = [[k, v] for k, v in gh_map.items()]
    case["gt_map"] = [[k, v] for k, v in gt_map.items()]
    return case

def pick_score():
    return rng.choice([1.0, 1.0, 0.9, 0.7, 0.7, 0.5])  # deliberate ties

def tri(a, b):  # upper-tri spot with tag-2 flip encoding for triu channels
    s = pick_score()
    return [a, b, 1, s] if a <= b else [b, a, 2, s]

TOK_WS = [" ", "\t", "　", "\xa0", "  ", " "]
TOK_ODD = ["", "ｘ！", "a b", "—", "…", '"q"', "\\n"]
TOK_PLAIN = ["ab", "c", "Name:", "42", "x", "KEY", "val_", "zz", "Total", "¥12"]

def rand_tokens(L):
    toks = []
    for _ in range(L):
        r = rng.random()
        if r < 0.12: toks.append(rng.choice(TOK_WS))
        elif r < 0.22: toks.append(rng.choice(TOK_ODD))
        else: toks.append(rng.choice(TOK_PLAIN))
    return toks

def rand_bbox(L):
    out = []
    for _ in range(L):
        l = rng.randint(0, 900); t = rng.randint(0, 1300)
        out.append([l, t, l + rng.randint(1, 200), t + rng.randint(1, 40)])
    return out

sd_cases = []
for trial in range(56):
    L = rng.randint(4, 40)
    gt_mode = trial % 3 == 2
    thresh = rng.choice([0.0, 0.0, 0.0, 0.6])
    # partition tokens into candidate lines (contiguous spans)
    spans = []
    i = 0
    while i < L:
        j = min(L - 1, i + rng.randint(0, 4))
        if rng.random() < 0.85:
            spans.append((i, j))
        i = j + 1
    le = [[h, t, rng.choice([1, 1, 1, 2]), pick_score()] for (h, t) in spans]
    for _ in range(rng.randint(0, 3)):  # noise spots incl. tag 0
        a = rng.randint(0, L - 1); b = rng.randint(a, L - 1)
        le.append([a, b, rng.choice([0, 1, 2]), pick_score()])
    # line grouping: link consecutive spans into chains; sometimes drop the
    # t2t confirmation (chain-break path), sometimes self-loop
    gh, gtl = [], []
    for k in range(len(spans) - 1):
        if rng.random() < 0.6:
            (h1, t1), (h2, t2) = spans[k], spans[k + 1]
            gh.append(tri(h1, h2))
            if rng.random() < 0.8:
                gtl.append(tri(t1, t2))
    if spans and rng.random() < 0.3:
        h = rng.choice(spans)[0]
        gh.append([h, h, 1, 1.0])  # self-loop guard path
    # entity links between span heads; register ent-tails for a mix of
    # first-line tails (validates chains of length 1) and random tails
    eh, et = [], []
    heads = [h for h, _ in spans]
    tails = [t for _, t in spans]
    for _ in range(rng.randint(0, 5)):
        if len(heads) >= 2:
            kh, vh = rng.sample(heads, 2)
            eh.append(tri(kh, vh))
    for _ in range(rng.randint(0, 6)):
        if len(tails) >= 2:
            a, b = rng.sample(tails, 2)
            et.append(tri(a, b))
    if rng.random() < 0.2 and L >= 2:  # head outside any line: skip path
        eh.append(tri(0, L - 1))
    sd_cases.append(run_decode({
        "text": rand_tokens(L), "bbox": rand_bbox(L), "gt": gt_mode,
        "thresh": thresh, "le": le, "eh": eh, "et": et, "gh": gh, "gtl": gtl,
    }))

# "clean" deterministic chains: every link confirmed, ent-tail registered on
# the true chain tails, so the kv-emission + strip + box-merge path is
# guaranteed exercised (random cases above may or may not validate)
for trial in range(8):
    nl = rng.randint(2, 6)       # lines per chain
    ll = rng.randint(1, 3)       # tokens per line
    nch = rng.randint(2, 4)      # chains
    spans, gh, gtl, le = [], [], [], []
    pos = 0
    chains = []
    for c in range(nch):
        ch = []
        for k in range(nl):
            spans.append((pos, pos + ll - 1))
            ch.append((pos, pos + ll - 1))
            pos += ll
        chains.append(ch)
    L = pos
    for (h, t) in spans:
        le.append([h, t, 1, 1.0])
    for ch in chains:
        for k in range(len(ch) - 1):
            gh.append(tri(ch[k][0], ch[k + 1][0]))
            gtl.append(tri(ch[k][1], ch[k + 1][1]))
    eh, et = [], []
    for c in range(nch - 1):
        kh = chains[c][0][0]; vh = chains[c + 1][0][0]
        eh.append(tri(kh, vh))
        et.append(tri(chains[c][-1][1], chains[c + 1][-1][1]))
    toks = rand_tokens(L)
    # force whitespace-only and whitespace-edged kv text into the mix
    if trial % 2 == 0:
        for (h, t) in chains[0]:
            for p in range(h, t + 1):
                toks[p] = rng.choice(TOK_WS)
    sd_cases.append(run_decode({
        "text": toks, "bbox": rand_bbox(L), "gt": trial % 3 == 2,
        "thresh": 0.0, "le": le, "eh": eh, "et": et, "gh": gh, "gtl": gtl,
    }))

# hand-built: 1000-step cap (decode.py:259-261). 1050 two-token lines in one
# chain; key walk caps after appending 1000 follow-on lines.
CAPN = 1050
cap_le = [[2 * k, 2 * k + 1, 1, 1.0] for k in range(CAPN)]
cap_gh = [[2 * k, 2 * (k + 1), 1, 1.0] for k in range(CAPN - 1)]
cap_gtl = [[2 * k + 1, 2 * (k + 1) + 1, 1, 1.0] for k in range(CAPN - 1)]
# key chain starts at line 0 and caps with curr tail = tail of line 1000;
# value is the final line (single, its grouping link leads nowhere new)
cap_eh = [[0, 2 * (CAPN - 1), 1, 1.0]]
cap_et = [[2 * 1000 + 1, 2 * (CAPN - 1) + 1, 1, 1.0]]
sd_cases.append(run_decode({
    "text": ["a", "b"] * CAPN, "bbox": [[k, 0, k + 1, 1] for k in range(2 * CAPN)],
    "gt": False, "thresh": 0.0,
    "le": cap_le, "eh": cap_eh, "et": cap_et, "gh": cap_gh, "gtl": cap_gtl,
}))
# hand-built: empty channels
sd_cases.append(run_decode({
    "text": ["x"], "bbox": [[0, 0, 1, 1]], "gt": False, "thresh": 0.0,
    "le": [], "eh": [], "et": [], "gh": [], "gtl": [],
}))
# hand-built: threshold filters everything
sd_cases.append(run_decode({
    "text": ["a", "b", "c"], "bbox": rand_bbox(3), "gt": False, "thresh": 0.6,
    "le": [[0, 1, 1, 0.5], [2, 2, 1, 0.59]], "eh": [[0, 2, 1, 0.5]],
    "et": [[1, 2, 1, 0.5]], "gh": [], "gtl": [],
}))
out["sample_decode"] = sd_cases

# --- SIBRDataset.__getitem__: execute the FULL dataset-side preprocessing
# loop (sibr.py:90-460) over synthetic annotation fixtures — truncation `>=`,
# empty-line/empty-entity exclusion-set timing, orig->sorted map, running
# token offsets, in-scope bookkeeping, spot channels, gt relations.
# The tokenizer is mocked with the ENGINE'S contract (graft.core.Tokenizer:
# identity-partition tokens, trailing-ws attach, empty for all-space lines;
# fetcher=None = identity), and line texts are pre-normalized with the
# EXECUTED _special_text_replace, mirroring DocBuilder.normalizeLineText.
# Internals (exclusion sets, maps, LineInfo offsets) are captured from the
# reference frame's locals via sys.settrace — the source runs UNMODIFIED.
import sys, tempfile, unicodedata

sib_src = open("/root/reference/data/datasets/sibr.py").read()
m_li = re.search(r"@dataclass\nclass LineInfo:.*?sorted_end_token: int = None\n", sib_src, re.S)
m_gi = re.search(r"    def __getitem__.*", sib_src, re.S)
ns_sib = {"json": json, "os": os,
          "sort_boxes": sort_boxes, "normalize_bbox": normalize_bbox,
          "box_augmentation": du.box_augmentation}
exec(compile(
    "from dataclasses import dataclass\n"
    "from typing import Callable, Dict, List, Optional, Union\n"
    + m_li.group(0) + "\nclass _DS:\n" + m_gi.group(0),
    "sibr_loop", "exec"), ns_sib)
_DS = ns_sib["_DS"]

def _is_core(c):
    cat = unicodedata.category(c)
    return cat[0] == 'L' or cat == 'Nd'  # Java Character.isLetterOrDigit

class MockTok:
    """graft.core.Tokenizer contract: leading-ws+core tokens, trailing ws
    attaches to the last token, all-space lines tokenize to []."""
    @staticmethod
    def tokenize(text):
        out = []
        i, n, token_start = 0, len(text), 0
        while i < n:
            if text[i].isspace():
                i += 1
            else:
                end = i + 1
                if _is_core(text[i]):
                    while end < n and _is_core(text[end]):
                        end += 1
                out.append(text[token_start:end])
                i = end
                token_start = end
        if not out:
            return []
        if token_start < n:
            out[-1] = out[-1] + text[token_start:]
        return out
    @staticmethod
    def convert_tokens_to_ids(tokens):
        return [0] * len(tokens)  # only the LENGTH feeds the loop

_sib_tmp = tempfile.mkdtemp(prefix="sibrvec")

def run_sibr(doc, max_token_len):
    """doc = engine-shaped fixture; texts are pre-normalized with the
    executed reference _special_text_replace before the loop sees them."""
    info = {
        "img": {"fname": doc["uid"], "width": doc["width"], "height": doc["height"]},
        "entities": [
            {"id": e["id"], "label": e["label"],
             "lines": [{"id": l["id"], "text": _special(l["text"]), "bbox": l["bbox"]}
                       for l in e["lines"]]}
            for e in doc["entities"]],
        "relations": {
            "kv_entity": [{"from_id": a, "to_id": b} for a, b in doc["kv"]],
            "line_grouping": [{"from_id": a, "to_id": b} for a, b in doc["grouping"]],
        },
    }
    fname = f"{abs(hash(doc['uid']))}.json"
    with open(os.path.join(_sib_tmp, fname), "w") as f:
        json.dump(info, f)
    ds = _DS()
    ds.tokenizer = MockTok()
    ds.tokenizer_fetcher = None
    ds.max_token_len = max_token_len
    ds.add_cls_token = False
    ds.add_sep_token = False
    ds.apply_box_aug = False
    ds.image_root = _sib_tmp
    ds.annotation_root = _sib_tmp
    ds.annotation_fname_list = [fname]

    captured = {}
    def tracer(frame, event, arg):
        if frame.f_code.co_name == "__getitem__":
            if event == "return":
                captured.update(frame.f_locals)
            return tracer
        return None
    sys.settrace(tracer)
    try:
        r = ds[0]
    finally:
        sys.settrace(None)

    return {
        "doc": doc, "max_token_len": max_token_len,
        "text": r["text"],
        "bbox": r["bbox"], "orig_bbox": r["orig_bbox"],
        "relations": [[x["key"], x["value"]] for x in r["relations"]],
        "le": [list(s) for s in r["line_extraction_matrix_spots"]],
        "eh": [list(s) for s in r["ent_linking_head_rel_matrix_spots"]],
        "et": [list(s) for s in r["ent_linking_tail_rel_matrix_spots"]],
        "gh": [list(s) for s in r["line_grouping_head_rel_matrix_spots"]],
        "gtl": [list(s) for s in r["line_grouping_tail_rel_matrix_spots"]],
        "empty_line": sorted(captured["empty_line"]),
        "empty_entity": sorted(captured["empty_entity"]),
        "entity_first_line": sorted(captured["entity_first_line_map"].items()),
        "entity_last_line": sorted(captured["entity_last_line_map"].items()),
        "entity_text": sorted(captured["entity_id_to_text_map"].items()),
        "in_scope_entity": sorted(captured["in_scope_entity_id"]),
        "in_scope_line": sorted(captured["in_scope_line_id"]),
        "line_orig_to_sorted": sorted(captured["line_orig_to_sorted_map"].items()),
        "sorted_lines": [
            {"line_id": ln.orig_line_id, "entity_id": ln.orig_entity_id,
             "category": ln.category, "tokens": ln.tokens, "coords": ln.coords,
             "start": ln.sorted_start_token, "end": ln.sorted_end_token}
            for ln in captured["all_sorted_line_list"]],
    }

_next_box_y = [0]
def fx_box():
    # distinct centers (sidesteps numpy unstable-sort ambiguity in sort_boxes)
    _next_box_y[0] += rng.choice([37, 41, 53])
    l = rng.randint(0, 900)
    return [l, _next_box_y[0], l + rng.randint(10, 300), _next_box_y[0] + rng.randint(5, 30)]

LINE_WORDS = ["Name", "Total", "42", "ok", "x9", "val"]
WS_ONLY = ["", " ", "　", "\xa0\xa0", " \t ", "\x1c"]
def fx_text(kind):
    if kind == "ws":
        return rng.choice(WS_ONLY)
    if kind == "special":
        return rng.choice(["Ｔｏｔａｌ：　４２", "☑ done – ok", "café ‘x’", "a—b™", "§5 ¢99 ü"])
    nw = rng.randint(1, 4)
    sep = rng.choice([" ", "  ", ", ", ": "])
    t = sep.join(rng.choice(LINE_WORDS) for _ in range(nw))
    return rng.choice(["", " "]) + t + rng.choice(["", " ", "  "])

def fx_doc(uid, n_entities, ws_rate, max_lines=4):
    _next_box_y[0] = 0
    entities, next_line_id = [], 0
    for eid in range(n_entities):
        lines = []
        for _ in range(rng.randint(0, max_lines)):
            kind = "ws" if rng.random() < ws_rate else \
                   ("special" if rng.random() < 0.2 else "plain")
            lines.append({"id": next_line_id, "text": fx_text(kind), "bbox": fx_box()})
            next_line_id += 1
        entities.append({"id": eid, "label": rng.choice(
            ["other", "header", "question", "question", "answer", "answer"]),
            "lines": lines})
    line_ids = [l["id"] for e in entities for l in e["lines"]]
    kv, grouping = [], []
    for _ in range(rng.randint(0, n_entities)):
        kv.append([rng.randrange(n_entities), rng.randrange(n_entities)])
    if rng.random() < 0.3:
        kv.append([n_entities + 5, rng.randrange(n_entities)])  # nonexistent id
    if rng.random() < 0.3 and kv:
        kv.append(list(kv[0]))  # duplicate relation
    for e in entities:  # chain consecutive lines within each entity
        ids = [l["id"] for l in e["lines"]]
        for a, b in zip(ids, ids[1:]):
            if rng.random() < 0.8:
                grouping.append([a, b])
    for _ in range(rng.randint(0, 3)):  # noise: random / reversed / self links
        if line_ids:
            a = rng.choice(line_ids)
            b = rng.choice(line_ids + [a, 999])
            grouping.append([a, b])
    return {"uid": uid, "width": rng.randint(400, 1600), "height": rng.randint(400, 2000),
            "entities": entities, "kv": kv, "grouping": grouping}

sib_cases = []
# hand-built: the empty_entity GLOBAL-list timing quirk — an all-empty FIRST
# entity lands in empty_entity; an all-empty LATER entity does not (and its
# last-line map records ANOTHER entity's line, its text is "")
sib_cases.append(run_sibr({
    "uid": "quirk-first-empty", "width": 800, "height": 600,
    "entities": [
        {"id": 0, "label": "question", "lines": [{"id": 0, "text": " ", "bbox": [10, 10, 60, 30]}]},
        {"id": 1, "label": "question", "lines": [{"id": 1, "text": "Name:", "bbox": [10, 50, 80, 70]}]},
        {"id": 2, "label": "answer", "lines": [{"id": 2, "text": "Bob", "bbox": [10, 90, 60, 110]}]},
    ], "kv": [[1, 2], [0, 2]], "grouping": [[1, 2]]}, 511))
sib_cases.append(run_sibr({
    "uid": "quirk-later-empty", "width": 800, "height": 600,
    "entities": [
        {"id": 0, "label": "question", "lines": [{"id": 0, "text": "Key", "bbox": [10, 10, 60, 30]}]},
        {"id": 1, "label": "answer", "lines": [{"id": 1, "text": "　", "bbox": [10, 50, 80, 70]},
                                                {"id": 2, "text": "  ", "bbox": [10, 90, 80, 110]}]},
        {"id": 2, "label": "answer", "lines": [{"id": 3, "text": "Val", "bbox": [10, 130, 60, 150]}]},
    ], "kv": [[0, 1], [0, 2]], "grouping": [[1, 3], [0, 3]]}, 511))
# hand-built: empty line mid-entity; entity text skips it, grouping via it skips
sib_cases.append(run_sibr({
    "uid": "mid-empty", "width": 800, "height": 600,
    "entities": [
        {"id": 0, "label": "question", "lines": [
            {"id": 0, "text": "Total ", "bbox": [10, 10, 90, 30]},
            {"id": 1, "text": "   ", "bbox": [10, 40, 90, 60]},
            {"id": 2, "text": "due:", "bbox": [10, 70, 90, 90]}]},
        {"id": 1, "label": "answer", "lines": [{"id": 3, "text": "¥42", "bbox": [10, 100, 60, 120]}]},
    ], "kv": [[0, 1]], "grouping": [[0, 1], [1, 2], [0, 2], [2, 3]]}, 511))
# hand-built: zero-line entity, all-empty doc, single-line doc
sib_cases.append(run_sibr({
    "uid": "zero-line-entity", "width": 500, "height": 500,
    "entities": [
        {"id": 0, "label": "header", "lines": []},
        {"id": 1, "label": "question", "lines": [{"id": 0, "text": "q", "bbox": [5, 5, 50, 25]}]},
        {"id": 2, "label": "other", "lines": []},
    ], "kv": [[0, 1], [1, 2]], "grouping": []}, 511))
sib_cases.append(run_sibr({
    "uid": "all-empty-doc", "width": 500, "height": 500,
    "entities": [
        {"id": 0, "label": "question", "lines": [{"id": 0, "text": " ", "bbox": [5, 5, 50, 25]}]},
        {"id": 1, "label": "answer", "lines": [{"id": 1, "text": "\t", "bbox": [5, 45, 50, 65]}]},
    ], "kv": [[0, 1]], "grouping": [[0, 1]]}, 511))
# hand-built: truncation boundary +/-1 over the same doc — 4 lines x 4 tokens,
# reading order == annotation order; cut thresholds 16/17/18 place the `>=`
# trip exactly at, one past, and one before the boundary line
trunc_doc = {
    "uid": "trunc-pm1", "width": 1000, "height": 1000,
    "entities": [
        {"id": e, "label": ("question" if e % 2 == 0 else "answer"),
         "lines": [{"id": e, "text": "a b c d", "bbox": [10, 10 + 40 * e, 200, 30 + 40 * e]}]}
        for e in range(4)
    ], "kv": [[0, 1], [2, 3], [0, 3]], "grouping": [[0, 1], [1, 2], [2, 3]]}
for mtl in (16, 17, 18):
    sib_cases.append(run_sibr(trunc_doc, mtl))
# hand-built: entity straddles the cut (first line in scope, last line out) —
# entity IS in-scope but kv via it fails the first/last-line-in-scope check
sib_cases.append(run_sibr({
    "uid": "straddle-cut", "width": 1000, "height": 1000,
    "entities": [
        {"id": 0, "label": "question", "lines": [{"id": 0, "text": "k1 k2", "bbox": [10, 10, 200, 30]}]},
        {"id": 1, "label": "answer", "lines": [
            {"id": 1, "text": "v1 v2", "bbox": [10, 50, 200, 70]},
            {"id": 2, "text": "v3 v4 v5 v6", "bbox": [10, 90, 200, 110]}]},
    ], "kv": [[0, 1]], "grouping": [[1, 2]]}, 9))
# hand-built: reading order reverses annotation order (truncation cuts by
# SORTED position, so the annotation-later line survives)
sib_cases.append(run_sibr({
    "uid": "sort-vs-cut", "width": 1000, "height": 1000,
    "entities": [
        {"id": 0, "label": "question", "lines": [{"id": 0, "text": "low low low", "bbox": [10, 800, 200, 830]}]},
        {"id": 1, "label": "answer", "lines": [{"id": 1, "text": "high high high", "bbox": [10, 10, 200, 40]}]},
    ], "kv": [[0, 1], [1, 0]], "grouping": []}, 5))
# seeded random sweep: ws-heavy, special-heavy, truncation-heavy mixes
for trial in range(26):
    ws_rate = [0.1, 0.35, 0.7][trial % 3]
    mtl = [12, 24, 48, 511][trial % 4]
    sib_cases.append(run_sibr(
        fx_doc(f"rand-{trial}", n_entities=rng.randint(1, 7), ws_rate=ws_rate), mtl))
out["sibr_dataset"] = sib_cases

os.makedirs("/root/repo/src/test/resources/refvec", exist_ok=True)
with open("/root/repo/src/test/resources/refvec/vectors.json", "w") as f:
    json.dump(out, f)
print("cases:", {k: len(v) for k, v in out.items()})
