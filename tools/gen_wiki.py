import random, sys, os
# deterministic synthetic MediaWiki dump: nFiles x nPages x nRevs
random.seed(42)
outdir, nfiles, npages, nrevs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
os.makedirs(outdir, exist_ok=True)
words = ["alpha","beta","gamma","delta","wiki","article","revision","text","content","edit"]
for f in range(nfiles):
    with open(f"{outdir}/dump{f}.xml", "w") as out:
        out.write('<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">\n')
        for p in range(npages):
            ns = 0 if p % 10 else 1
            out.write(f"<page><title>Page_{f}_{p}</title><ns>{ns}</ns><id>{p}</id>\n")
            day0 = random.randint(0, 5000)
            for r in range(nrevs):
                d = day0 + r * random.randint(0, 3)
                y, rem = 2001 + d // 365, d % 365
                mo, dy = 1 + rem // 31, 1 + rem % 28
                body = " ".join(random.choices(words, k=random.randint(50, 150)))
                out.write(f"<revision><id>{r}</id><timestamp>{y:04d}-{mo:02d}-{dy:02d}T{r%24:02d}:00:00Z</timestamp>"
                          f"<text xml:space=\"preserve\">{body}</text></revision>\n")
            out.write("</page>\n")
        out.write("</mediawiki>\n")
print(sum(os.path.getsize(f"{outdir}/{f}") for f in os.listdir(outdir)) / 1e6, "MB")
