"""Deterministic synthetic Apache combined-log generation.

The reference ships 85 captured log lines as its only fixture
(``src/main/resources/access_log.txt``, SURVEY §5). We do NOT copy that
file; instead this module generates lines covering the same edge-case
classes (FIXTURES.md §1):

- well-formed GET with ``?mod=forumdisplay&fid=N`` (section hit)
- well-formed GET with ``?mod=viewthread&tid=N`` (article hit)
- ``mod=ajax&...&fid=N`` URLs that must NOT match either id regex
- plain URIs (fid/tid absent -> 0/0)
- status mix 200/403/404/408
- aborted request ``"-" 408 -`` style lines (regex-parseable here but
  request-split fails -> ids 0) and fully malformed lines (dropped)
- referers containing fid/tid that must never be extracted
- timezone offsets that must be discarded on parse

Everything is seeded -> reproducible fixtures for unit tests, golden
files, streaming tests, and the bench harness.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

UA_POOL = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Safari/605.1.15",
    "curl/8.0.1",
)

ZONES = ("+0800", "-0700", "+0000", "+0530")


def _fmt_apache_time(dt: datetime, zone: str) -> str:
    # English month abbreviations, as in Apache's default %t.
    months = (
        "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()
    )
    return (
        f"{dt.day:02d}/{months[dt.month - 1]}/{dt.year}:"
        f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d} {zone}"
    )


def generate_log_lines(
    n: int,
    seed: int = 42,
    start: datetime | None = None,
    n_sections: int = 40,
    n_articles: int = 1000,
    n_ips: int = 200,
) -> list[str]:
    """Generate ``n`` combined-format lines with a seeded RNG."""
    rng = random.Random(seed)
    t = start or datetime(2020, 8, 27, 10, 0, 0)
    lines: list[str] = []
    for _ in range(n):
        t += timedelta(seconds=rng.randint(0, 5))
        ip = (
            f"192.168.{rng.randint(0, 20)}.{rng.randint(1, n_ips)}"
        )
        zone = rng.choice(ZONES)
        ts = _fmt_apache_time(t, zone)
        ua = rng.choice(UA_POOL)
        status = rng.choices((200, 404, 403, 408), weights=(80, 10, 6, 4))[0]
        nbytes = rng.randint(200, 60000)
        kind = rng.random()
        referer = "-"
        if kind < 0.35:  # section hit
            fid = rng.randint(1, n_sections)
            uri = f"/forum.php?mod=forumdisplay&fid={fid}"
        elif kind < 0.60:  # article hit; referer carries a fid that must NOT match
            tid = rng.randint(1, n_articles)
            uri = f"/forum.php?mod=viewthread&tid={tid}&extra=page%3D1"
            referer = (
                f"http://kms-4/forum.php?mod=forumdisplay&fid={rng.randint(1, n_sections)}"
            )
        elif kind < 0.72:  # ajax URL that must NOT match either regex
            uri = (
                f"/forum.php?mod=ajax&action=forumchecknew&fid={rng.randint(1, n_sections)}"
                f"&time={rng.randint(10 ** 9, 2 * 10 ** 9)}"
            )
        elif kind < 0.88:  # plain URIs
            uri = rng.choice(("/test.php", "/favicon.ico", "/index.php", "/robots.txt"))
        elif kind < 0.94:  # aborted request: "-" 408 -
            lines.append(f'{ip} - - [{ts}] "-" 408 - "-" "{ua}"')
            continue
        else:  # malformed garbage the parser must DROP
            lines.append(f"{ip} broken line without quotes {rng.randint(0, 99)}")
            continue
        lines.append(
            f'{ip} - - [{ts}] "GET {uri} HTTP/1.1" {status} {nbytes} "{referer}" "{ua}"'
        )
    return lines


def write_log_file(path: str, n: int, seed: int = 42, **kw) -> list[str]:
    lines = generate_log_lines(n, seed=seed, **kw)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lines
