"""Porter2 (Snowball English) stemmer golden + property tests.

Golden pairs hand-traced from the published algorithm description
(snowballstem.org); the reference uses PyStemmer's compiled version of
the same algorithm (/root/reference/utils/__init__.py:104-126)."""

from hypothesis import given, strategies as st

from bm25_benchmarks_ray.functions.porter2 import stem, stem_words

GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "tie", "cries": "cri",
    "caress": "caress", "cats": "cat", "flies": "fli", "dies": "die",
    "gas": "gas", "gaps": "gap",
    # 1a exceptions / invariants
    "inning": "inning", "outing": "outing", "canning": "canning",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    "news": "news", "sky": "sky", "bias": "bias", "atlas": "atlas",
    # special forms
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "knitting": "knit", "running": "run", "runs": "run",
    # step 1c
    "happy": "happi", "crying": "cri", "by": "by", "say": "say",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # R1 special prefixes
    "generate": "generat", "generates": "generat", "generating": "generat",
    "general": "general", "generic": "generic", "communism": "communism",
    "arsenic": "arsenic",
    # misc
    "consigned": "consign", "consignment": "consign", "argument": "argument",
    "arguments": "argument", "knightly": "knight",
}


def test_golden_pairs():
    bad = {w: (e, stem(w)) for w, e in GOLDEN.items() if stem(w) != e}
    assert not bad, f"stemmer mismatches: {bad}"


def test_short_words_unchanged():
    for w in ("a", "ab", "is", "x", ""):
        assert stem(w) == w


def test_stem_words_batch():
    ws = ["running", "runs", "easily"]
    assert stem_words(ws) == [stem(w) for w in ws]


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=20))
def test_idempotent_never_crashes(w):
    s = stem(w)
    assert isinstance(s, str)
    assert len(s) <= len(w) + 1  # only 1b can add an 'e'


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", min_size=0, max_size=15))
def test_apostrophes_never_crash(w):
    assert isinstance(stem(w), str)
