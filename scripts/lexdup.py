#!/usr/bin/env python3
"""Dev helper: list duplicate terms in SentimentLexicon.scala (within the
lexicon word lists) and collisions with Vader booster/negator words, before
the ScalaTest integrity gate runs. Usage: python3 scripts/lexdup.py"""
import re, collections, sys

SRC = "src/main/scala/graft/functions/SentimentLexicon.scala"
VADER = "src/main/scala/graft/functions/Vader.scala"

text = open(SRC).read()
# cut everything from the `all` combinator on (df/valuesSql column names)
text = text[:text.index("val all:")]
words = re.findall(r'"([a-z][a-z0-9\'\-]*)"', text)
dups = [w for w, c in collections.Counter(words).items() if c > 1]

vtext = open(VADER).read()
boosters = set(re.findall(r'"([a-z][a-z0-9\'\-]*)"\s*->', vtext))
neg_m = re.search(r"negators: Set\[String\] = Set\((.*?)\)", vtext, re.S)
negators = set(re.findall(r'"([^"]+)"', neg_m.group(1)))
mods = (boosters | negators) & set(words)

if dups:
    print("DUPLICATES:", sorted(dups))
if mods:
    print("BOOSTER/NEGATOR COLLISIONS:", sorted(mods))
if not dups and not mods:
    print(f"clean: {len(words)} terms, no duplicates, no modifier collisions")
sys.exit(1 if (dups or mods) else 0)
