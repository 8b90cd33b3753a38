#!/usr/bin/env python3
"""Independent cross-check of graft's native Porter stemmer.

A from-the-paper Python implementation of Porter (1980), written separately
from the Scala expression, used as a dev-time differential check: run the
Scala stemmer over a vocabulary (see TextOpsSpec / StemDump), run this one,
and diff. Not part of the build.

Usage: porter_check.py <wordlist-file>   # one word per line -> "word stem"
"""
import sys


def stem(word):
    if len(word) <= 2:
        return word
    b = list(word)
    state = {"k": len(b) - 1, "j": 0}

    def cons(i):
        c = b[i]
        if c in "aeiou":
            return False
        if c == "y":
            return True if i == 0 else not cons(i - 1)
        return True

    def measure():
        n, i, j = 0, 0, state["j"]
        while i <= j and cons(i):
            i += 1
        if i > j:
            return n
        i += 1
        while True:
            while i <= j and not cons(i):
                i += 1
            if i > j:
                return n
            i += 1
            n += 1
            while i <= j and cons(i):
                i += 1
            if i > j:
                return n
            i += 1

    def vowel_in_stem():
        return any(not cons(i) for i in range(state["j"] + 1))

    def doublec(i):
        return i >= 1 and b[i] == b[i - 1] and cons(i)

    def cvc(i):
        if i < 2 or not cons(i) or cons(i - 1) or not cons(i - 2):
            return False
        return b[i] not in "wxy"

    def ends(s):
        k = state["k"]
        l = len(s)
        if l > k + 1:
            return False
        if "".join(b[k - l + 1:k + 1]) != s:
            return False
        state["j"] = k - l
        return True

    def setto(s):
        j = state["j"]
        b[j + 1:j + 1 + len(s)] = list(s)
        state["k"] = j + len(s)
        del b[state["k"] + 1:]

    def r(s):
        if measure() > 0:
            setto(s)

    # step 1ab
    if b[state["k"]] == "s":
        if ends("sses"):
            state["k"] -= 2
        elif ends("ies"):
            setto("i")
        elif b[state["k"] - 1] != "s":
            state["k"] -= 1
    if ends("eed"):
        if measure() > 0:
            state["k"] -= 1
    elif (ends("ed") or ends("ing")) and vowel_in_stem():
        state["k"] = state["j"]
        if ends("at"):
            setto("ate")
        elif ends("bl"):
            setto("ble")
        elif ends("iz"):
            setto("ize")
        elif doublec(state["k"]):
            state["k"] -= 1
            if b[state["k"]] in "lsz":
                state["k"] += 1
        elif measure() == 1 and cvc(state["k"]):
            setto("e")
    # step 1c
    if ends("y") and vowel_in_stem():
        b[state["k"]] = "i"
    # step 2
    for suf, rep in [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
                     ("alli", "al"), ("entli", "ent"), ("eli", "e"),
                     ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
                     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")]:
        if ends(suf):
            r(rep)
            break
    # step 3
    for suf, rep in [("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")]:
        if ends(suf):
            r(rep)
            break
    # step 4
    matched = False
    for suf in ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent"]:
        if ends(suf):
            matched = True
            break
    if not matched:
        if ends("ion") and state["j"] >= 0 and b[state["j"]] in "st":
            matched = True
        else:
            for suf in ["ou", "ism", "ate", "iti", "ous", "ive", "ize"]:
                if ends(suf):
                    matched = True
                    break
    if matched and measure() > 1:
        state["k"] = state["j"]
    # step 5
    state["j"] = state["k"]
    if b[state["k"]] == "e":
        a = measure()
        if a > 1 or (a == 1 and not cvc(state["k"] - 1)):
            state["k"] -= 1
    if b[state["k"]] == "l" and doublec(state["k"]) and measure() > 1:
        state["k"] -= 1
    return "".join(b[:state["k"] + 1])


if __name__ == "__main__":
    for line in open(sys.argv[1]):
        w = line.strip()
        if w:
            print(w, stem(w))
