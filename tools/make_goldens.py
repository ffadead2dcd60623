#!/usr/bin/env python3
"""Golden generator: executes the REFERENCE's Python semantics over the
fixture inputs dumped by `sbt "runMain graft.fixtures.GoldenDump"` and writes
byte-identity goldens into src/test/resources/golden/.

The normalization functions replicate helpers.py / mtb_data_loader.py /
preprocess.py constants verbatim (same language -> same regex semantics).
The tokenizer goldens run the reference's own BasicTokenizer/WordpieceTokenizer
classes, exec'd straight out of /root/reference/model/bert_tokenizer.py with
the transformers base class stubbed.
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IN = os.path.join(ROOT, "target", "golden_in")
OUT = os.path.join(ROOT, "src", "test", "resources", "golden")
os.makedirs(OUT, exist_ok=True)

# ---- helpers.py Normalizer semantics ----
URL_RE = r"((https?:\/\/|www\d{0,3}[.]|[a-z0-9.\-]+[.][a-z]{2,4}\/)(?:[^\s()<>]+|\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+(?:\(([^\s()<>]+|(\([^\s()<>]+\)))*\)|[^\s`!()\[\]{};:'\".,<>?«»“”‘’]))"  # noqa


def normalize(text):
    text = str(text)
    text = text.lower()
    text = re.sub(re.compile("<.*?>"), "", text)
    text = re.sub(URL_RE, "", text)
    text = re.sub(" +", " ", text)
    return text.strip()


# ---- mtb_data_loader.py _clean_sent / _process_textlines semantics ----
def clean_sent(sent):
    if sent not in {" ", "\n", ""}:
        sent = sent.strip("\n")
        sent = re.sub("<[A-Z]+/*>", "", sent)
        sent = re.sub(r"[\*\"\n\\…\+\-\/\=\(\)‘•€\[\]\|♫:;—”“~`#]", " ", sent)
        sent = " ".join(sent.split())
        sent = sent.strip()
        sent = re.sub(r"([\.\?,!]){2,}", r"\1", sent)
        sent = re.sub(r"([A-Z]{2,})", lambda x: x.group(1).capitalize(), sent)
        return sent


def process_textlines(text):
    text = [clean_sent(sent) for sent in text]
    text = " ".join([t for t in text if t is not None])
    text = re.sub(" {2,}", " ", text)
    return text


# ---- preprocess.py get_art_abs semantics ----
END_TOKENS = [".", "!", "?", "...", "'", "`", '"', "’", "”", ")"]


def fix_missing_period(line):
    if "@highlight" in line:
        return line
    if line == "":
        return line
    if line[-1] in END_TOKENS:
        return line
    return line + " ."


def get_art_abs(lines):
    lines = [line.strip() for line in lines]
    lines = [fix_missing_period(line) for line in lines]
    article_lines = []
    next_is_highlight = False
    for idx, line in enumerate(lines):
        if line == "":
            continue
        elif line.startswith("@highlight"):
            next_is_highlight = True
        elif next_is_highlight:
            continue
        else:
            index = line.find("(CNN) -- ")
            if index > -1:
                line = line[index + len("(CNN) -- "):]
            article_lines.append(line)
    return " ".join(article_lines)


# ---- reference tokenizer, exec'd from the repo with the HF base stubbed ----
def load_reference_tokenizer_classes():
    import types
    import collections  # noqa
    fake_tu = types.ModuleType("transformers.tokenization_utils")

    class PreTrainedTokenizer:  # minimal stand-in for class definition only
        def __init__(self, **kw):
            self.max_len = int(1e12)
            for k, v in kw.items():
                setattr(self, k + "_token", v) if isinstance(v, str) else None

    fake_tu.PreTrainedTokenizer = PreTrainedTokenizer
    fake_t = types.ModuleType("transformers")
    fake_t.tokenization_utils = fake_tu
    sys.modules.setdefault("transformers", fake_t)
    sys.modules["transformers.tokenization_utils"] = fake_tu
    src = open("/root/reference/model/bert_tokenizer.py", encoding="utf-8").read()
    ns = {}
    exec(compile(src, "bert_tokenizer.py", "exec"), ns)
    return ns["BasicTokenizer"], ns["WordpieceTokenizer"]


SPECIALS = ["[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]"]
ADDED = ["[E1]", "[/E1]", "[E2]", "[/E2]", "[BLANK]"]


def full_tokenize(text, basic, wordpiece, vocab):
    """Split on atomic added/special tokens, then basic+wordpiece — the
    HF-base tokenize() behavior for added tokens."""
    atomic = ADDED + SPECIALS
    out = []
    i, seg_start, n = 0, 0, len(text)
    while i < n:
        matched = None
        if text[i] == "[":
            for t in atomic:
                if text.startswith(t, i):
                    matched = t
                    break
        if matched:
            seg = text[seg_start:i]
            if seg:
                for tok in basic.tokenize(seg, never_split=SPECIALS):
                    out.extend(wordpiece.tokenize(tok))
            out.append(matched)
            i += len(matched)
            seg_start = i
        else:
            i += 1
    seg = text[seg_start:]
    if seg:
        for tok in basic.tokenize(seg, never_split=SPECIALS):
            out.extend(wordpiece.tokenize(tok))
    return out


def token_ids(tokens, vocab, added_ids):
    unk = vocab["[UNK]"]
    return [added_ids.get(t, vocab.get(t, unk)) for t in tokens]


def main():
    # pages -> article assembly -> clean -> normalize
    out_rows = []
    with open(os.path.join(IN, "pages.jsonl"), encoding="utf-8") as f:
        for line in f:
            row = json.loads(line)
            article = get_art_abs(row["text"].split("\n"))
            cleaned = process_textlines([article])
            norm = normalize(cleaned)
            out_rows.append(json.dumps(
                {"id": row["id"], "article": article, "clean": cleaned,
                 "norm": norm}, ensure_ascii=False))
    with open(os.path.join(OUT, "text_norm.golden.jsonl"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(out_rows) + "\n")

    # vocab + tokenizer goldens
    vocab = {}
    with open(os.path.join(IN, "vocab.txt"), encoding="utf-8") as f:
        for idx, tok in enumerate(f.read().split("\n")):
            vocab[tok] = idx
    added_ids = {t: len(vocab) + i for i, t in enumerate(ADDED)}
    Basic, Wordpiece = load_reference_tokenizer_classes()
    basic = Basic(do_lower_case=False, never_split=None,
                  tokenize_chinese_chars=True)
    wordpiece = Wordpiece(vocab=vocab, unk_token="[UNK]")

    probe_rows = []
    with open(os.path.join(IN, "tokenize_probes.jsonl"), encoding="utf-8") as f:
        probes = [json.loads(l)["text"] for l in f if l.strip()]
    # also tokenize the normalized fixture pages (real pipeline input)
    for row in out_rows[:24]:
        probes.append(json.loads(row)["norm"])
    for text in probes:
        toks = full_tokenize(text, basic, wordpiece, vocab)
        probe_rows.append(json.dumps(
            {"text": text, "tokens": toks,
             "ids": token_ids(toks, vocab, added_ids)}, ensure_ascii=False))
    with open(os.path.join(OUT, "tokenize.golden.jsonl"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(probe_rows) + "\n")

    # SemEval preprocessing goldens (semeval_dataloader.py:145-162 semantics)
    for split in ("train", "test"):
        with open(os.path.join(IN, f"semeval_{split}.txt"),
                  encoding="utf-8") as f:
            text = f.readlines()
        rows = []
        for i in range(int(len(text) / 4)):
            sent = text[4 * i]
            relation = text[4 * i + 1].strip()
            ex_id = int(re.match(r"^\d+", sent)[0])
            sent = re.findall('"(.+)"', sent)[0]
            sent = re.sub("<e1>", "[E1]", sent)
            sent = re.sub("</e1>", "[/E1]", sent)
            sent = re.sub("<e2>", "[E2]", sent)
            sent = re.sub("</e2>", "[/E2]", sent)
            sent = normalize(sent)
            sent = re.sub(r"\[e1]", "[E1]", sent)
            sent = re.sub(r"\[/e1]", "[/E1]", sent)
            sent = re.sub(r"\[e2]", "[E2]", sent)
            sent = re.sub(r"\[/e2]", "[/E2]", sent)
            toks = ["[CLS]"] + full_tokenize(sent, basic, wordpiece, vocab) + ["[SEP]"]
            rows.append(json.dumps(
                {"id": ex_id, "sent": sent, "relation": relation,
                 "tokens": toks,
                 "ids": token_ids(toks, vocab, added_ids)},
                ensure_ascii=False))
        with open(os.path.join(OUT, f"semeval_{split}.golden.jsonl"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(rows) + "\n")

    print("goldens written to", OUT)


if __name__ == "__main__":
    main()
