"""Serial reference-semantics simulator — the parity spec.

A plain-Python re-implementation of the reference crawler's scheduling
semantics (NOT its code), used to assert that the Spark engine reproduces
the reference's crawl ordering and final URL-seen set (north_rule):

- 3 queues: spider > tracxn > crunchbase; FIFO within each
  (rabbitmq/scheduler.py:51-52,136-162; the 60-idle-poll threshold only
  affects wall time for a serial consumer, never order)
- site validation discard on pop (rabbitmq/queue.py:131-168)
- nack+requeue returns the message to the HEAD of its queue (single
  consumer redelivery semantics; pipelines.py:184-201) — modeled as
  appendleft with attempt+1
- dedup at enqueue against everything ever enqueued
  (similar_companies.py:49-68 + queue-drain dedup)
- cb company page -> similar-companies continuation on the spider queue
  (spiders/crunchy.py:216-228); continuation/tracxn pages expand
  industry-gated similar URLs (similar_companies.py:29-33)

Fetch/parse use the same deterministic rules as the Spark engine
(fetchsim.CHALLENGE_MOD / SOLVE_FAIL_MOD, image_id = sha % n_images).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import pandas as pd

from .datagen import INTERESTED_INDUSTRIES
from .fetchsim import CHALLENGE_MOD, SOLVE_FAIL_MOD
from .urlnorm import canonicalize_series


@dataclass
class SimResult:
    order: list[str] = field(default_factory=list)  # canonical URLs in fetch order
    seen: set[str] = field(default_factory=set)  # canonical URLs ever enqueued
    items: list[str] = field(default_factory=list)  # canonical URLs with items
    failed: list[str] = field(default_factory=list)


def _canon_many(urls: list[str]) -> list[str]:
    return list(canonicalize_series(pd.Series(urls, dtype="object"))) if urls else []


class RefSimulator:
    def __init__(
        self,
        page_meta_pdf: pd.DataFrame,
        n_images: int,
        max_attempts: int = 3,
        interested: list[str] | None = None,
        cloudflare_hosts_suffix: str = "crunchbase.com",
    ):
        self.meta = {r["image_id"]: r for _, r in page_meta_pdf.iterrows()}
        self.n_images = n_images
        self.max_attempts = max_attempts
        self.interested = set(interested or INTERESTED_INDUSTRIES)
        self.cf_suffix = cloudflare_hosts_suffix

    @staticmethod
    def _site(url: str) -> str:
        if "crunchbase.com" in url:
            return "crunchbase"
        if "tracxn.com" in url:
            return "tracxn"
        return "other"

    @staticmethod
    def _host(url: str) -> str:
        rest = url.split("://", 1)[1] if "://" in url else url
        return rest.split("/", 1)[0].split(":", 1)[0]

    def run(self, seed_urls: list[str], max_pops: int | None = None) -> SimResult:
        from .datagen import image_id_for, sha_int_of

        res = SimResult()
        spider: deque = deque()
        tracxn: deque = deque()
        cb: deque = deque()

        def enqueue(canon: str, is_continuation: bool) -> None:
            site = self._site(canon)
            if site == "other":
                return  # discarded at enqueue (site validation)
            if canon in res.seen:
                return  # dedup at enqueue
            res.seen.add(canon)
            entry = {"url": canon, "attempt": 0}
            if is_continuation:
                spider.append(entry)
            elif site == "tracxn":
                tracxn.append(entry)
            else:
                cb.append(entry)

        for canon in _canon_many(seed_urls):
            enqueue(canon, is_continuation=False)

        pops = 0
        while spider or tracxn or cb:
            if max_pops is not None and pops >= max_pops:
                break
            q = spider if spider else (tracxn if tracxn else cb)
            entry = q.popleft()
            url = entry["url"]
            pops += 1
            res.order.append(url)

            sha = sha_int_of(url)
            host = self._host(url)
            challenge = host.endswith(self.cf_suffix) and sha % CHALLENGE_MOD == 0
            solve_fail = challenge and sha % SOLVE_FAIL_MOD == 0
            if solve_fail:
                entry["attempt"] += 1
                if entry["attempt"] < self.max_attempts:
                    q.appendleft(entry)  # nack + requeue to head
                else:
                    res.failed.append(url)
                continue

            # fetch+parse
            meta = self.meta[image_id_for(url, self.n_images)]
            site = self._site(url)
            is_continuation = site == "crunchbase" and url.endswith("/similar")
            if not is_continuation:
                res.items.append(url)
            if site == "crunchbase" and not is_continuation:
                enqueue(url + "/similar", is_continuation=True)
            if is_continuation or site == "tracxn":
                sims = list(meta["similar_companies"] or [])
                industries = set(meta["industries"] or [])
                if sims and industries & self.interested:
                    for canon in _canon_many(sims):
                        if canon != url:
                            enqueue(canon, is_continuation=False)
        return res
