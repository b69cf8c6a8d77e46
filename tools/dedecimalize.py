"""One-shot rewrite: wrap SUM(CAST(.. AS DECIMAL(30,8))) [OVER (..)] in CAST(.. AS DOUBLE).

The driver's correctness gate converts results to pandas; DuckDB DECIMAL
becomes float64 there while Spark DECIMAL stays decimal.Decimal objects, so
any decimal output column hash-mismatches even when value-exact.  Keeping
the decimal cast INSIDE the sum (exact, order-independent) and final-casting
to DOUBLE on both engine and oracle sides makes both hash as float64.
"""

import re
import sys


def match_parens(s: str, i: int) -> int:
    """i points at '('; return index just past the matching ')'."""
    depth = 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parens")


def rewrite(text: str) -> str:
    out = []
    i = 0
    pat = re.compile(r"SUM\(CAST\(", re.IGNORECASE)
    while True:
        m = pat.search(text, i)
        if m is None:
            out.append(text[i:])
            break
        start = m.start()
        # already wrapped directly in CAST( ... )? harmless to re-wrap (no-op),
        # so don't bother detecting.
        end = match_parens(text, start + 3)  # paren of SUM(
        # check the inner CAST target is DECIMAL(30,8); otherwise leave alone
        inner = text[start:end]
        if "DECIMAL(30,8)" not in inner.replace(" ", ""):
            out.append(text[i:end])
            i = end
            continue
        # absorb an attached OVER (...) clause
        j = end
        while j < len(text) and text[j] in " \t\n":
            j += 1
        if text[j : j + 4].upper() == "OVER":
            k = j + 4
            while k < len(text) and text[k] in " \t\n":
                k += 1
            if k < len(text) and text[k] == "(":
                end = match_parens(text, k)
        out.append(text[i:start])
        out.append("CAST(" + text[start:end] + " AS DOUBLE)")
        i = end
    return "".join(out)


if __name__ == "__main__":
    for path in sys.argv[1:]:
        with open(path) as f:
            t = f.read()
        nt = rewrite(t)
        n = len(re.findall(r"CAST\(SUM\(CAST\(", nt)) - len(re.findall(r"CAST\(SUM\(CAST\(", t))
        with open(path, "w") as f:
            f.write(nt)
        print(f"{path}: wrapped (net new CAST(SUM( sites: {n})")
