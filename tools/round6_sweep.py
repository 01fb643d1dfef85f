#!/usr/bin/env python3
"""One-shot codemod: replace round(EXPR, 6) with the engine-exact floor
form — round6(EXPR) in Scala Column code, floor((EXPR) * 1000000 + 0.5)
/ 1000000 inside oracle SQL strings (lines carrying a stripMargin '|').
Kept in tools/ as the audit record of the sweep (VERDICT r7 next-round
item 3)."""
import sys

def rewrite(path):
    src = open(path).read()
    out = []
    i = 0
    n = len(src)
    changed = 0
    while i < n:
        j = src.find("round(", i)
        if j < 0:
            out.append(src[i:])
            break
        # skip math.round / StrictMath.round / word chars before
        if j > 0 and (src[j-1].isalnum() or src[j-1] in "._"):
            out.append(src[i:j+6])
            i = j + 6
            continue
        # match parens
        depth = 0
        k = j + 5  # at '('
        while k < n:
            if src[k] == '(':
                depth += 1
            elif src[k] == ')':
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = src[j+6:k]  # between outer parens
        if not inner.rstrip().endswith(", 6") and not inner.rstrip().endswith(",6"):
            out.append(src[i:j+6])
            i = j + 6
            continue
        expr = inner.rstrip()
        expr = expr[:expr.rfind(",")].rstrip()
        # classify: SQL if the line containing j has a '|' margin char
        ls = src.rfind("\n", 0, j) + 1
        line_prefix = src[ls:j]
        is_sql = "|" in line_prefix or '"' in line_prefix and "AS " in src[j:k]
        out.append(src[i:j])
        if is_sql:
            out.append("floor((%s) * 1000000 + 0.5) / 1000000" % expr)
        else:
            out.append("round6(%s)" % expr)
        changed += 1
        i = k + 1
    new = "".join(out)
    if changed:
        open(path, "w").write(new)
    print("%s: %d sites" % (path, changed))

for p in sys.argv[1:]:
    rewrite(p)
