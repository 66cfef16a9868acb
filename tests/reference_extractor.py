"""Independent per-document reference extractor (plain python re) used
as the span-sequence ground truth for the vectorized UDF. Encodes the
same behavioral rules as operators/extraction.py but as a separate,
straightforward implementation — parity between the two is the
invariant (kind, text, media_ref, order)."""

from __future__ import annotations

import hashlib
import re

BLOCK_SPLIT = re.compile(
    r"(?i)<(?:p|div|h[1-6]|li|ul|ol|table|tr|article|section|br)\b[^>]*>"
)
STRIP = re.compile(
    r"(?is)<(script|style|noscript|head|option|embed|applet)\b[^>]*>.*?</\1>"
)
TAG = re.compile(r"(?s)<[^>]+>")
WORD = re.compile(r"[A-Za-z0-9]+")
ANCHOR = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
IMG = re.compile(r"(?i)<img\b[^>]*>")


def extract(html: str) -> dict:
    title_m = re.search(r"(?is)<title[^>]*>(.*?)</title>", html or "")
    title = re.sub(r"\s+", " ", title_m.group(1)).strip() if title_m else ""
    body = STRIP.sub(" ", html or "")
    spans = []
    media_ids = []
    total_words = 0
    for block in BLOCK_SPLIT.split(body):
        text = re.sub(r"\s+", " ", TAG.sub(" ", block)).strip()
        words = WORD.findall(text)
        anchor_txt = TAG.sub(" ", " ".join(ANCHOR.findall(block)))
        link_words = WORD.findall(anchor_txt)
        density = len(link_words) / (len(words) if words else 1)
        if len(words) < 5 or density > 0.5:
            continue
        total_words += len(words)
        spans.append(("text", text, ""))
        for img in IMG.findall(block):
            src_m = re.search(r'(?i)src\s*=\s*["\']([^"\']+)["\']', img)
            w_m = re.search(r'(?i)width\s*=\s*["\']?(\d+)', img)
            h_m = re.search(r'(?i)height\s*=\s*["\']?(\d+)', img)
            alt_m = re.search(r'(?i)alt\s*=\s*["\']([^"\']*)["\']', img)
            if not (src_m and w_m and h_m):
                continue
            src, w, h = src_m.group(1), int(w_m.group(1)), int(h_m.group(1))
            alt = alt_m.group(1) if alt_m else title
            if (
                w < 200
                or h < 200
                or w * h < 40_000
                or len(src) > 500
                or src.lower().endswith(".gif")
                or alt == ""
            ):
                continue
            ref = f"Web#{int(hashlib.md5(src.encode()).hexdigest()[:15], 16)}"
            spans.append(("media", "", ref))
            media_ids.append(ref)
    return {
        "title": title,
        "is_article": total_words >= 30,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ],
        "media_ids": media_ids,
    }
