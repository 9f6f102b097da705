"""Engine-wide constants and the locked crawl semantics.

This module is the single source of truth for the semantics that BOTH the
pure-Python reference simulator (``fixtures/simulator.py``) and the Spark
engine (``plans/crawl.py``) must implement.  The judged invariant
(BASELINE.json:2) is that the two produce the *exact same crawl ordering and
URL-seen set* on the shared seed list + politeness budget.

Reference parity notes (reference repo ``sevas/csxj-crawler`` was empty on
disk; semantics reconstructed in SURVEY.md §3.1 from the public repo):

* Sources are iterated in a FIXED order (the reference's hardcoded source
  list) — here ``SOURCE_ORDER``.
* Within a source, queued URLs drain FIFO (discovery order) — here the
  ``discovered_seq`` ordering.
* New URLs are enqueued only if never seen (set-difference against the
  provider's stored URL set) — here the global seen set (hosts never cross
  sources, so global ≡ per-provider union).
* Politeness is explicit in the new engine (north_rule): at most
  ``per_wave_budget(crawl_delay)`` fetches per host per wave, fetches of one
  host spaced ``crawl_delay`` seconds apart inside a wave.

Crawl loop (one "wave" = one reference cron tick):

1.  Wave 0 frontier = canonicalized seeds, de-duplicated keeping the lowest
    ``seed_rank``; ``discovered_seq`` = position in that order.
2.  Each wave:
    a. robots gating: any queued URL whose path matches a ``disallow`` prefix
       of its host is EXCLUDED (stays in the seen set, never fetched).
    b. per-host selection: the first ``per_wave_budget(host)`` queued URLs of
       each host, ordered by (priority DESC, discovered_seq ASC).
    c. global wave order: selection sorted by
       (source_idx ASC, discovered_seq ASC);  the global wave cap
       ``WAVE_URL_BUDGET`` truncates in that order.  ``seq`` (the judged
       crawl order) is the running counter over waves in that order.
    d. fetch: join against the web graph; status 200 → parse outlinks,
       payload; 404/500/missing → error row, crawl continues.
    e. discovery: outlinks of successful fetches, canonicalized, ordered by
       (parent seq ASC, outlink position ASC), de-duplicated keeping first,
       anti-joined against the seen set; survivors get the next
       ``discovered_seq`` values and state QUEUED.
    f. fetch timestamps: ``EPOCH + wave*WAVE_SECONDS + k*crawl_delay`` where
       k is the 0-based rank of the fetch within its host's wave selection.
3.  Stop when the frontier has no QUEUED rows or ``MAX_WAVES`` is reached.
"""

from __future__ import annotations

# Fixed source iteration order — mirrors the reference's hardcoded datasource
# list (SURVEY.md §3.1 E2: "outer loop iterates sources in fixed list order").
SOURCE_ORDER: tuple[str, ...] = ("lesoir", "lalibre", "dhnet", "sudinfo")

SOURCE_IDX: dict[str, int] = {s: i for i, s in enumerate(SOURCE_ORDER)}

#: seconds of simulated time per wave (one cron tick)
WAVE_SECONDS: float = 10.0

#: global cap of fetches per wave (the "wave budget")
WAVE_URL_BUDGET: int = 2000

#: hard stop for the wave loop
MAX_WAVES: int = 50

#: epoch of simulated fetch timestamps (unix seconds)
CRAWL_EPOCH: float = 1_700_000_000.0

#: query parameters stripped by canonicalization (exact names)
TRACKING_PARAMS: frozenset[str] = frozenset(
    {"fbclid", "gclid", "ref", "mc_cid", "mc_eid", "igshid"}
)
#: query-parameter prefixes stripped by canonicalization
TRACKING_PREFIXES: tuple[str, ...] = ("utm_",)

#: number of host-hash buckets for frontier partitioning (power of two).
#: At 10^10 URLs this yields ~10M URLs / bucket; bench scale uses the same
#: code path with a smaller bucket count set at session build time.
DEFAULT_HOST_BUCKETS: int = 64

#: salt cardinality for skewed-host salting (J4)
DEFAULT_SALT: int = 8

#: discovery priority rule: a discovered URL's priority is
#: ``parent_priority * priority_decay``; ``None`` reproduces the reference's
#: uniform behaviour (every discovery enqueued at priority 1.0).  Both the
#: simulator and the engine take the knob and must stay in lock-step.
DEFAULT_PRIORITY_DECAY: float | None = None

#: phash near-duplicate Hamming threshold (D6)
PHASH_HAMMING_T: int = 6

#: bloom filter bits per key (D2); k = bits_per_key * ln2 rounded
BLOOM_BITS_PER_KEY: int = 10
BLOOM_NUM_HASHES: int = 7

#: seen-row threshold below which the bloom prefilter is auto-disabled —
#: under it the exact anti-join broadcasts the small seen side anyway and
#: the per-wave bloom build/merge/probe jobs are pure overhead (measured
#: ~25% slower at 60k-page bench scale).  The 10^10 design regime is far
#: above this.
BLOOM_MIN_SEEN: int = 500_000

#: sub-task fan-out for bloom build/probe within one host_bucket (D2/D3).
#: A hot host concentrates rows in one bucket; unsalted, that single Arrow
#: cogroup task bounds the whole build/probe stage (a straggler on any
#: cluster size).  Splitting by ``hash % BLOOM_SALT`` at the bucket's full
#: m keeps results bit-identical while parallelizing the hot bucket.
BLOOM_SALT: int = 16

#: sidecar-size threshold for the broadcast (map-side) bloom probe: at or
#: under it the whole sidecar ships to each executor once and the probe
#: pipelines with the frontier scan — no candidate shuffle at all; above it
#: the cogrouped probe partitions blobs so no executor ever holds the whole
#: sidecar.  256 MB = 10 bits/key over ~2×10^8 seen keys; comfortably inside
#: a standard 4-8 GB executor alongside shuffle/cache, same sizing logic as
#: a broadcast-join threshold.  The 10^10-seen regime (~12.5 GB sidecar)
#: takes the cogroup path.
BLOOM_BCAST_MAX_BYTES: int = 256 << 20

#: per-bucket occupancy cap for every LSH band self-join (minhash, simhash,
#: phash, hyperplane-ANN).  Within-bucket pair generation is quadratic in
#: bucket occupancy; 16-bit bands give ≤65,536 buckets, so ONE pathological
#: value (e.g. a boilerplate page class hashing to the same band) can
#: otherwise go O(k²) at 100 TB.  Buckets keep their ``cap``
#: lowest-id members (deterministic); dropped rows are counted via
#: ``Observation`` metrics on the same action — never a silent cap (the
#: count rides the query's own job, zero extra Spark jobs).  Fixture
#: occupancies are ≪ this, so small-scale outputs are unchanged.
BAND_BUCKET_CAP: int = 1024


def per_wave_budget(crawl_delay: float) -> int:
    """Max fetches of one host inside one wave given its crawl_delay.

    ``floor(WAVE_SECONDS / crawl_delay)`` but at least 1 — the last fetch of a
    wave lands at ``(c-1)*delay <= WAVE_SECONDS - delay`` so the gap to the
    next wave's first fetch is >= delay: politeness holds across waves too.
    """
    if crawl_delay <= 0:
        return WAVE_URL_BUDGET
    return max(1, int(WAVE_SECONDS // crawl_delay))
