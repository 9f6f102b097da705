"""Pure-Python reference crawl simulator (SURVEY.md §5.2.1).

Reimplements the reference's loop semantics — sequential per-source iteration
in fixed list order, FIFO queue drain, set-difference dedup (SURVEY.md §3.1,
[M csxj/article_queue.py + scripts/]) — extended with the north_rule's
explicit politeness budget and robots gating (BASELINE.json:14), exactly as
locked in :mod:`csxj_crawler_spark.spec`.

This is the GOLDEN oracle: the Spark engine must reproduce its crawl order
(sequence-exact) and final URL-seen set (set-exact).  It deliberately shares
no code with the engine: canonicalization here uses :mod:`urllib.parse`,
the engine uses vectorized regex — agreement is part of the test.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import parse_qsl, urlsplit, urlunsplit

import pyarrow.parquet as pq

from csxj_crawler_spark import spec


def canon_py(url: str) -> str:
    """Independent (urllib-based) implementation of the P1 canonical rule."""
    url = (url or "").strip()
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k not in spec.TRACKING_PARAMS
        and not any(k.startswith(p) for p in spec.TRACKING_PREFIXES)
    ]
    query = "&".join(f"{k}={v}" for k, v in q)
    return urlunsplit((scheme, netloc, path, query, ""))


@dataclass
class FrontierItem:
    url: str
    host: str
    source: str
    priority: float
    discovered_seq: int
    parent_url: str | None = None
    wave_discovered: int = 0


@dataclass
class SimResult:
    crawl_order: list[dict] = field(default_factory=list)  # seq,url,host,wave,...
    seen: dict[str, int] = field(default_factory=dict)  # url -> discovered_seq
    excluded: list[str] = field(default_factory=list)
    errors: list[dict] = field(default_factory=list)
    wave_metrics: list[dict] = field(default_factory=list)


def _host_of(url: str) -> str:
    return urlsplit(url).hostname or ""


def simulate(
    graph: dict[str, dict],
    seeds: list[dict],
    robots: dict[str, dict],
    wave_budget: int = spec.WAVE_URL_BUDGET,
    max_waves: int = spec.MAX_WAVES,
    priority_decay: float | None = spec.DEFAULT_PRIORITY_DECAY,
) -> SimResult:
    """Run the reference crawl loop.

    ``graph``  : canonical url -> {outlinks: [{url,...}], status, image_id}
    ``seeds``  : rows with url, source, priority, seed_rank
    ``robots`` : host -> {disallow: [prefix], crawl_delay: float}
    """
    res = SimResult()
    queued: list[FrontierItem] = []
    next_seq = 0

    # wave 0 frontier: canonicalize seeds, dedup keeping lowest seed_rank
    for row in sorted(seeds, key=lambda r: r["seed_rank"]):
        cu = canon_py(row["url"])
        if cu in res.seen:
            continue
        res.seen[cu] = next_seq
        queued.append(
            FrontierItem(
                url=cu,
                host=_host_of(cu),
                source=row["source"],
                priority=row["priority"],
                discovered_seq=next_seq,
            )
        )
        next_seq += 1

    seq = 0
    for wave in range(max_waves):
        if not queued:
            break
        urls_in = len(queued)

        # a. robots gating
        allowed: list[FrontierItem] = []
        for it in queued:
            rb = robots.get(it.host, {"disallow": [], "crawl_delay": 1.0})
            path = urlsplit(it.url).path or "/"
            if any(path.startswith(p) for p in rb["disallow"]):
                res.excluded.append(it.url)
            else:
                allowed.append(it)

        # b. per-host politeness selection: top-c by (prio desc, seq asc)
        by_host: dict[str, list[FrontierItem]] = {}
        for it in allowed:
            by_host.setdefault(it.host, []).append(it)
        selected: list[tuple[FrontierItem, int]] = []  # (item, rank_in_host)
        for host, items in by_host.items():
            c = spec.per_wave_budget(
                robots.get(host, {"crawl_delay": 1.0}).get("crawl_delay", 1.0)
            )
            items.sort(key=lambda x: (-x.priority, x.discovered_seq))
            for rank, it in enumerate(items[:c]):
                selected.append((it, rank))

        # c. global wave order + budget, assign seq
        selected.sort(
            key=lambda t: (spec.SOURCE_IDX[t[0].source], t[0].discovered_seq)
        )
        selected = selected[:wave_budget]
        sel_urls = {t[0].url for t in selected}

        # d. fetch + e. discovery
        fetched = errors = 0
        discoveries: list[tuple[int, int, str, FrontierItem]] = []
        for it, host_rank in selected:
            delay = robots.get(it.host, {"crawl_delay": 1.0}).get("crawl_delay", 1.0)
            ts = spec.CRAWL_EPOCH + wave * spec.WAVE_SECONDS + host_rank * delay
            page = graph.get(it.url)
            status = page["status"] if page is not None else 0
            rec = {
                "seq": seq,
                "url": it.url,
                "host": it.host,
                "source": it.source,
                "wave": wave,
                "fetch_ts": ts,
                "status": int(status),
                "image_id": (page or {}).get("image_id"),
            }
            res.crawl_order.append(rec)
            if status == 200:
                fetched += 1
                for pos, link in enumerate(page["outlinks"]):
                    discoveries.append((seq, pos, link["url"], it))
            else:
                errors += 1
                res.errors.append({"seq": seq, "url": it.url, "status": int(status)})
            seq += 1

        # f. dedup discoveries, enqueue new
        discoveries.sort(key=lambda d: (d[0], d[1]))
        new_count = 0
        wave_new: dict[str, None] = {}
        for parent_seq, pos, raw, parent in discoveries:
            cu = canon_py(raw)
            if cu in res.seen or cu in wave_new:
                continue
            wave_new[cu] = None
            res.seen[cu] = next_seq
            host = _host_of(cu)
            prefix = host.split("-", 1)[0]
            source = prefix if prefix in spec.SOURCE_IDX else parent.source
            queued.append(
                FrontierItem(
                    url=cu,
                    host=host,
                    source=source,
                    priority=(
                        1.0
                        if priority_decay is None
                        else parent.priority * priority_decay
                    ),
                    discovered_seq=next_seq,
                    parent_url=parent.url,
                    wave_discovered=wave + 1,
                )
            )
            next_seq += 1
            new_count += 1

        queued = [it for it in queued if it.url not in sel_urls and it.url not in {u for u in res.excluded}]
        res.wave_metrics.append(
            {
                "wave": wave,
                "urls_in": urls_in,
                "urls_new": new_count,
                "fetched": fetched,
                "errors": errors,
            }
        )
    return res


def load_fixture_inputs(fix_dir: str):
    """Read generator output into the plain-Python shapes simulate() wants."""
    g = pq.read_table(f"{fix_dir}/web_graph.parquet").to_pylist()
    graph = {
        r["url"]: {
            "outlinks": r["outlinks"] or [],
            "status": r["status"],
            "image_id": r["image_id"],
        }
        for r in g
    }
    seeds = pq.read_table(f"{fix_dir}/seeds.parquet").to_pylist()
    robots = {
        r["host"]: {"disallow": r["disallow"] or [], "crawl_delay": r["crawl_delay"]}
        for r in pq.read_table(f"{fix_dir}/robots.parquet").to_pylist()
    }
    return graph, seeds, robots


def simulate_dir(fix_dir: str, **kw) -> SimResult:
    graph, seeds, robots = load_fixture_inputs(fix_dir)
    return simulate(graph, seeds, robots, **kw)
