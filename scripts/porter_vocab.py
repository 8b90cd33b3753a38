#!/usr/bin/env python3
"""Generate the adversarial vocabulary for the Porter differential check.

Crosses the fixture corpus words and the stems from the 1980 paper's
examples with every suffix family the algorithm's five steps touch —
~6.4k words, including nonsense forms (a differential check needs rule
coverage, not real words). Pipeline:

    python3 scripts/porter_vocab.py > /tmp/porter_vocab.txt
    sbt "testOnly graft.PorterDumpSpec"       # native stems -> /tmp/porter_scala.txt
    python3 scripts/porter_check.py /tmp/porter_vocab.txt > /tmp/porter_py.txt
    diff <(sort /tmp/porter_scala.txt) <(sort /tmp/porter_py.txt)   # expect empty
"""
import sys

import duckdb

FIXTURES = "/root/testdata/sf0.1/documents.parquet"

STEMS = [
    "caress", "pony", "ti", "cat", "feed", "agree", "plaster", "bled",
    "motor", "sing", "conflate", "trouble", "size", "hop", "tan", "fall",
    "hiss", "fizz", "fail", "file", "relate", "condition", "rational",
    "valence", "hesitance", "digitize", "conformable", "radical",
    "differentiable", "vile", "analogous", "vietnamize", "predicate",
    "operate", "feudal", "decisive", "hopeful", "callous", "formality",
    "sensitivity", "sensibility", "triplicate", "formative", "electrical",
    "hopefulness", "goodness", "revival", "allowance", "inference",
    "airliner", "gyroscopic", "adjustable", "defensible", "irritant",
    "replacement", "adjustment", "dependent", "adoption", "homologous",
    "communism", "activate", "angularity", "homologue", "effective",
    "bowdlerize", "probate", "rate", "cease", "control", "roll", "oe",
    "sky", "crying", "dying", "flying", "eye", "by", "say", "e", "a",
    "ab", "abe", "ya", "yack",
]

SUFFIXES = [
    "", "s", "es", "ies", "ied", "ying", "ed", "ing", "eed", "ly", "ness",
    "ational", "tional", "enci", "anci", "izer", "abli", "alli", "entli",
    "eli", "ousli", "ization", "ation", "ator", "alism", "iveness",
    "fulness", "ousness", "aliti", "iviti", "biliti", "icate", "ative",
    "alize", "iciti", "ical", "ful", "ant", "ence", "ement", "ment",
    "ent", "ion", "ism", "ate", "iti", "ous", "ive", "ize", "al", "er",
    "ible", "able", "e", "y", "sses",
]


def main() -> None:
    corpus = [
        row[0]
        for row in duckdb.sql(
            "SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+')) "
            f"FROM '{FIXTURES}'"
        ).fetchall()
    ]
    vocab = sorted({base + suf for base in corpus + STEMS if base for suf in SUFFIXES})
    sys.stdout.write("\n".join(vocab) + "\n")


if __name__ == "__main__":
    main()
