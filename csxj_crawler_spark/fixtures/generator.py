"""Deterministic synthetic fixtures (FIXTURES.md) — seed=42, no network.

Generates the five crawl-side tables as parquet:

* ``web_graph``       — the synthetic fetchable web (stands in for live HTTP)
* ``seeds``           — the shared seed list the crawl ordering is judged on
* ``robots``          — per-host disallow prefixes + crawl_delay budget
* ``images_captions`` — payload table, EXACT schema of BASELINE.json:15
* ``images_golden``   — decoded golden pixels for fidelity checks

Everything is derived from ``numpy.random.RandomState(seed)`` so the same
(seed, n_pages) always produces byte-identical tables.  Host names encode
their source (``{source}-{k}.example``) mirroring the reference's four judged
datasource suites (lesoir/lalibre/dhnet/sudinfo — BASELINE.json:6).  The
host-size distribution is deliberately skewed (one host owns ~30% of pages)
to exercise salting / AQE skew handling.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from csxj_crawler_spark import spec
from csxj_crawler_spark.functions import images as img

_VOCAB = (
    "belgian news press article photo report brussels liege namur charleroi "
    "politics sport culture economy weather traffic interview analysis live "
    "update exclusive editor morning evening daily weekly city region world"
).split()

_SECTIONS = ("news", "sports", "culture", "private")

#: outlink media kinds (full TaggedURL vocabulary, SURVEY.md §1.1
#: [M csxj/common/tagging.py]): "text" is a plain hyperlink, "plaintext" a
#: bare URL pasted without markup; image/video/tweet are embedded media
_LINK_KINDS = ("text", "image", "video", "tweet", "plaintext")
_LINK_KIND_P = (0.62, 0.18, 0.08, 0.05, 0.07)
#: where on the page the link sits
_LINK_POSITIONS = ("in text", "sidebar box", "bottom box", "embedded")
_LINK_POSITION_P = (0.55, 0.2, 0.15, 0.1)


def source_of_host(host: str) -> str:
    """Hosts are named ``{source}-{k}.example``; the source is the prefix."""
    return host.split("-", 1)[0]


def make_hosts(
    rng: np.random.RandomState, hosts_per_source: int | None = None
) -> list[str]:
    hosts = []
    for src in spec.SOURCE_ORDER:
        n = hosts_per_source or (4 if src == "lesoir" else 3)
        hosts += [f"{src}-{k}.example" for k in range(n)]
    return hosts


def _messify(rng: np.random.RandomState, url: str) -> str:
    """Render a canonical URL the way a scraped page might spell it."""
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    path = "/" + path
    r = rng.rand()
    if r < 0.15:
        host = host.upper()
    if rng.rand() < 0.15:
        host = host + ":80"
    if rng.rand() < 0.2:
        path = path + "/"
    q = []
    if rng.rand() < 0.25:
        q.append("utm_source=feed&utm_medium=web")
    if rng.rand() < 0.1:
        q.append("fbclid=abc123")
    if rng.rand() < 0.1:
        q.append("page=1")  # NOT tracking — must survive canonicalization
    out = f"{scheme}://{host}{path}"
    if q:
        out += "?" + "&".join(q)
    if rng.rand() < 0.3:
        out += "#section-%d" % rng.randint(9)
    return out


def generate(
    out_dir: str,
    n_pages: int = 2000,
    seed: int = 42,
    with_images: bool = True,
    n_seeds_per_source: int = 10,
    hosts_per_source: int | None = None,
    priority_choices: tuple[float, ...] = (1.0,),
) -> dict[str, str]:
    """Write all fixture tables under ``out_dir``; returns name→path map.

    ``hosts_per_source`` widens the synthetic web (default 4/3/3/3 hosts, the
    golden-test shape); bench/scaling fixtures use hundreds of hosts so waves
    carry thousands of URLs (the politeness cap is per host).
    ``priority_choices`` draws each seed's priority from the given values —
    pass several to exercise non-uniform priority ordering (with the
    engine/simulator ``priority_decay`` knob, discoveries then inherit
    decayed parent priorities)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    hosts = make_hosts(rng, hosts_per_source)

    # --- page population: skewed host assignment --------------------------
    weights = np.full(len(hosts), 0.7 / (len(hosts) - 1))
    weights[0] = 0.3  # lesoir-0.example owns ~30% of the web
    host_idx = rng.choice(len(hosts), size=n_pages, p=weights)
    sections = rng.choice(len(_SECTIONS), size=n_pages, p=[0.5, 0.2, 0.2, 0.1])
    urls = np.array(
        [
            f"http://{hosts[hi]}/{_SECTIONS[si]}/art-{i:05d}"
            for i, (hi, si) in enumerate(zip(host_idx, sections))
        ]
    )
    status = rng.choice([200, 404, 500], size=n_pages, p=[0.92, 0.05, 0.03])
    fetch_cost_ms = rng.randint(10, 200, size=n_pages).astype(np.int32)

    # --- outlinks: mostly same-source, some cross-source, messy spellings -
    outlinks: list[list[dict]] = []
    by_source: dict[str, np.ndarray] = {}
    page_sources = np.array([source_of_host(hosts[hi]) for hi in host_idx])
    for s in spec.SOURCE_ORDER:
        by_source[s] = np.where(page_sources == s)[0]
    def _link_tags(r: np.random.RandomState) -> dict:
        return {
            "kind": str(r.choice(_LINK_KINDS, p=_LINK_KIND_P)),
            "position": str(r.choice(_LINK_POSITIONS, p=_LINK_POSITION_P)),
        }

    for i in range(n_pages):
        k = rng.randint(0, 13)
        links = []
        src = page_sources[i]
        for _ in range(k):
            if rng.rand() < 0.8 and len(by_source[src]) > 0:
                j = by_source[src][rng.randint(len(by_source[src]))]
            else:
                j = rng.randint(n_pages)
            links.append(
                {
                    "url": _messify(rng, urls[j]),
                    "title": " ".join(rng.choice(_VOCAB, 3)),
                    "rel": "internal" if page_sources[j] == src else "external",
                    **_link_tags(rng),
                }
            )
        if rng.rand() < 0.08:  # in-page anchor link (canonicalizes to self)
            links.append(
                {
                    "url": _messify(rng, urls[i]) + "#comments",
                    "title": "comments",
                    "rel": "internal",
                    **_link_tags(rng),
                }
            )
        if rng.rand() < 0.05:  # dangling external link → fetch-error path
            links.append(
                {
                    "url": f"http://offsite-{rng.randint(5)}.example/x{rng.randint(99)}",
                    "title": "offsite",
                    "rel": "external",
                    **_link_tags(rng),
                }
            )
        if links and rng.rand() < 0.2:  # literal duplicate link on the page
            links.append(dict(links[0]))
        outlinks.append(links)

    image_ids = np.where(
        status == 200, np.array([f"img{i:08d}" for i in range(n_pages)]), None
    )

    link_t = pa.struct(
        [
            ("url", pa.string()),
            ("title", pa.string()),
            ("rel", pa.string()),
            ("kind", pa.string()),
            ("position", pa.string()),
        ]
    )
    web_graph = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([hosts[hi] for hi in host_idx], pa.string()),
            "outlinks": pa.array(outlinks, pa.list_(link_t)),
            "image_id": pa.array(image_ids, pa.string()),
            "status": pa.array(status, pa.int32()),
            "fetch_cost_ms": pa.array(fetch_cost_ms, pa.int32()),
        }
    )

    # --- seeds: per source in SOURCE_ORDER, messy + duplicate spellings ---
    seed_rows = []
    for src in spec.SOURCE_ORDER:
        pool = by_source[src]
        picks = pool[rng.randint(len(pool), size=n_seeds_per_source)]
        for j in picks:
            seed_rows.append((_messify(rng, urls[j]), src))
        # duplicate of the first pick under a different spelling
        seed_rows.append((_messify(rng, urls[picks[0]]), src))
    seed_prio = [
        float(rng.choice(list(priority_choices))) for _ in seed_rows
    ]
    seeds = pa.table(
        {
            "url": pa.array([r[0] for r in seed_rows], pa.string()),
            "source": pa.array([r[1] for r in seed_rows], pa.string()),
            "priority": pa.array(seed_prio, pa.float64()),
            "seed_rank": pa.array(range(len(seed_rows)), pa.int64()),
        }
    )

    # --- robots -----------------------------------------------------------
    delays = rng.choice([1.0, 2.0, 2.5, 5.0], size=len(hosts))
    disallow = []
    for hi, h in enumerate(hosts):
        if h == "sudinfo-2.example":
            disallow.append(["/"])  # fully disallowed host
        elif rng.rand() < 0.5:
            disallow.append(["/private"])
        else:
            disallow.append([])
    robots = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow": pa.array(disallow, pa.list_(pa.string())),
            "crawl_delay": pa.array(delays, pa.float64()),
        }
    )

    paths = {}
    tables = {"web_graph": web_graph, "seeds": seeds, "robots": robots}

    # --- images_captions + golden pixels ----------------------------------
    if with_images:
        img_rows = np.where(status == 200)[0]
        n_img = len(img_rows)
        fmts = rng.choice(["raw", "ppm", "png"], size=n_img)
        ws = rng.randint(16, 65, size=n_img).astype(np.int32)
        hs = rng.randint(16, 65, size=n_img).astype(np.int32)
        pixels: list[np.ndarray] = []
        ids, blobs, caps, phashes = [], [], [], []
        for k in range(n_img):
            if k > 20 and rng.rand() < 0.05:
                # near-duplicate of an earlier image: same pixels + tiny noise
                src_k = rng.randint(k)
                base = pixels[src_k]
                noise = rng.randint(-2, 3, size=base.shape)
                pix = np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8)
                ws[k], hs[k] = ws[src_k], hs[src_k]
            else:
                # low-frequency random field → phash bits are stable
                small = rng.randint(0, 256, size=(4, 4, 3)).astype(np.float64)
                yy = np.linspace(0, 3, hs[k])[:, None]
                xx = np.linspace(0, 3, ws[k])[None, :]
                y0 = np.floor(yy).astype(int)
                x0 = np.floor(xx).astype(int)
                y1 = np.minimum(y0 + 1, 3)
                x1 = np.minimum(x0 + 1, 3)
                fy = (yy - y0)[..., None]
                fx = (xx - x0)[..., None]
                pix = (
                    small[y0, x0] * (1 - fy) * (1 - fx)
                    + small[y0, x1] * (1 - fy) * fx
                    + small[y1, x0] * fy * (1 - fx)
                    + small[y1, x1] * fy * fx
                ).astype(np.uint8)
            pixels.append(pix)
            ids.append(f"img{img_rows[k]:08d}")
            blobs.append(img.ENCODERS[fmts[k]](pix))
            caps.append(" ".join(rng.choice(_VOCAB, rng.randint(3, 21))))
            phashes.append(img.phash64(pix))
        images_captions = pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(phashes, pa.int64()),
            }
        )
        images_golden = pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "pixels": pa.array([p.tobytes() for p in pixels], pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
            }
        )
        tables["images_captions"] = images_captions
        tables["images_golden"] = images_golden

    # --- articles_raw + golden: per-source structured-extraction fixtures --
    # (ArticleData analogue, SURVEY.md §1.1/§5.1: title/author/pub date+time/
    # category breadcrumb/intro/content per stored page blob, one distinct
    # markup layout per source so extraction dispatch is real.)  Uses an
    # INDEPENDENT rng stream seeded off the page fields so nothing above —
    # and therefore no existing golden — changes.
    art = _gen_articles(
        np.random.RandomState(seed ^ 0x5A17), urls, page_sources, status
    )
    tables["articles_raw"] = art[0]
    tables["articles_golden"] = art[1]

    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


#: per-source page layouts (distinct tags/attrs/date formats, like the four
#: reference datasource parsers): render(title, date parts, author, cats,
#: intro, paragraphs) -> html string.  Layout quirks exercised: different
#: date spellings, optional author, breadcrumb separators, nested containers.
def _render_lesoir(t, y, mo, d, h, mi, au, cats, intro, pars):
    body = "\n".join(f'<p class="article-par">{p}</p>' for p in pars)
    author = f'<span class="article__author">{au}</span>\n' if au else ""
    return (
        f"<html><head><title>{t} - lesoir</title>\n"
        f'<meta name="publication" content="{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}"/>'
        f"</head>\n<body>\n"
        f'<nav class="breadcrumb">{cats[0]} &gt; {cats[1]}</nav>\n'
        f'<h1 class="article__title">{t}</h1>\n{author}'
        f'<p class="chapo">{intro}</p>\n{body}\n</body></html>'
    )


def _render_lalibre(t, y, mo, d, h, mi, au, cats, intro, pars):
    body = "\n".join(f"<p>{p}</p>" for p in pars)
    author = f'<em class="signature">{au}</em>\n' if au else ""
    return (
        f"<html><body>\n"
        f'<ul class="breadcrumb"><li>{cats[0]}</li><li>{cats[1]}</li></ul>\n'
        f'<h1 id="articleTitle">{t}</h1>\n'
        f'<div class="publishedDate">Publié le {d:02d}/{mo:02d}/{y:04d} à {h:02d}h{mi:02d}</div>\n'
        f"{author}"
        f'<div class="intro"><p>{intro}</p></div>\n'
        f'<div class="article-body">{body}</div>\n</body></html>'
    )


def _render_dhnet(t, y, mo, d, h, mi, au, cats, intro, pars):
    body = "\n".join(f"<p>{p}</p>" for p in pars)
    author = f'<p class="auteur">Par {au}</p>\n' if au else ""
    return (
        f"<html><body>\n"
        f'<div class="filariane">{cats[0]}/{cats[1]}</div>\n'
        f'<h2 class="titre">{t}</h2>\n'
        f'<time datetime="{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}">x</time>\n'
        f"{author}"
        f'<p class="lead">{intro}</p>\n'
        f'<section class="texte">{body}</section>\n</body></html>'
    )


def _render_sudinfo(t, y, mo, d, h, mi, au, cats, intro, pars):
    body = "\n".join(f'<p class="par">{p}</p>' for p in pars)
    author = f'<span class="byline">{au}</span>\n' if au else ""
    return (
        f"<html><body>\n"
        f'<p class="crumbs">{cats[0]} | {cats[1]}</p>\n'
        f"<h1>{t}</h1>\n"
        f'<span class="date">{d:02d}/{mo:02d}/{y:04d} {h:02d}:{mi:02d}</span>\n'
        f"{author}"
        f'<p class="intro">{intro}</p>\n'
        f"<article>{body}</article>\n</body></html>"
    )


_RENDERERS = {
    "lesoir": _render_lesoir,
    "lalibre": _render_lalibre,
    "dhnet": _render_dhnet,
    "sudinfo": _render_sudinfo,
}


def _gen_articles(rng2, urls, page_sources, status):
    raw_rows: list[tuple] = []
    gold_rows: list[tuple] = []
    cats_pool = ["actualite", "sports", "culture", "economie", "regions", "monde"]
    for i in np.where(status == 200)[0]:
        src = page_sources[i]
        title = " ".join(rng2.choice(_VOCAB, rng2.randint(3, 7))).capitalize()
        y, mo, d = 2010 + int(rng2.randint(3)), 1 + int(rng2.randint(12)), 1 + int(
            rng2.randint(28)
        )
        h, mi = int(rng2.randint(24)), int(rng2.randint(60))
        author = (
            " ".join(rng2.choice(_VOCAB, 2)).title() if rng2.rand() < 0.8 else None
        )
        cats = list(rng2.choice(cats_pool, 2, replace=False))
        intro = " ".join(rng2.choice(_VOCAB, rng2.randint(8, 16)))
        pars = [
            " ".join(rng2.choice(_VOCAB, rng2.randint(10, 30)))
            for _ in range(int(rng2.randint(1, 6)))
        ]
        html = _RENDERERS[src](title, y, mo, d, h, mi, author, cats, intro, pars)
        raw_rows.append((str(urls[i]), src, html))
        gold_rows.append(
            (
                str(urls[i]), src, title,
                f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}",
                author, cats, intro, pars,
            )
        )
    raw = pa.table(
        {
            "url": pa.array([r[0] for r in raw_rows], pa.string()),
            "source": pa.array([r[1] for r in raw_rows], pa.string()),
            "raw_html": pa.array([r[2] for r in raw_rows], pa.string()),
        }
    )
    golden = pa.table(
        {
            "url": pa.array([g[0] for g in gold_rows], pa.string()),
            "source": pa.array([g[1] for g in gold_rows], pa.string()),
            "title": pa.array([g[2] for g in gold_rows], pa.string()),
            "pub_ts": pa.array([g[3] for g in gold_rows], pa.string()),
            "author": pa.array([g[4] for g in gold_rows], pa.string()),
            "category": pa.array([g[5] for g in gold_rows], pa.list_(pa.string())),
            "intro": pa.array([g[6] for g in gold_rows], pa.string()),
            "content": pa.array([g[7] for g in gold_rows], pa.list_(pa.string())),
        }
    )
    return raw, golden
