#!/usr/bin/env python3
"""Convert a wiki XML dump into a MULTISTREAM bz2 file: independent bz2
streams of ~pages_per_stream whole pages, concatenated byte-aligned —
the enwiki multistream layout WikiBz2 splits on.
Usage: gen_multistream.py <in.xml> <out.xml.bz2> [pages_per_stream]"""
import bz2, sys

src, dst = sys.argv[1], sys.argv[2]
per = int(sys.argv[3]) if len(sys.argv) > 3 else 100

with open(src, "rb") as f:
    data = f.read()

# split on page boundaries, keeping the header with the first chunk and
# the closing root tag with the last
starts = []
i = 0
while True:
    j = data.find(b"<page>", i)
    if j < 0:
        break
    starts.append(j)
    i = j + 6

chunks = []
prev = 0
for k in range(0, len(starts), per):
    cut = starts[k]
    if cut > prev:
        chunks.append(data[prev:cut])
        prev = cut
chunks.append(data[prev:])
# merge the header fragment into the first page chunk
if len(chunks) > 1 and b"<page>" not in chunks[0]:
    chunks = [chunks[0] + chunks[1]] + chunks[2:]

with open(dst, "wb") as out:
    for c in chunks:
        out.write(bz2.compress(c))
print(f"{len(chunks)} streams, {sum(len(c) for c in chunks)/1e6:.1f} MB xml "
      f"-> {sys.argv[2]}")
