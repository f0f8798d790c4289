"""Per-host politeness token buckets + robots.txt cache (north rule).

Absent from the reference (SURVEY.md §2.3 — it crawls one host
sequentially with no rate control and never reads robots.txt); the
north rule adds per-host politeness token buckets and robots caches in
stateful actors.

``SchedulerShard`` owns a *shard* of the host space (hosts are
hash-partitioned across shards, so any host's state lives on exactly
one actor).  Per host it holds:
  * a token bucket (rate tokens/round, burst cap) — BSP crawl rounds
    are the clock (SURVEY.md §1 "batch vs streaming");
  * cached robots.txt Disallow rules (fetched once per host).

The frontier release stage calls ``filter_and_grant(host, urls)`` once
per host-group per round: robots-disallowed URLs are rejected
permanently, the first ``tokens`` remaining URLs (already seq-sorted by
the caller) are released, the rest deferred to the next round.

Hot-host splitting (north rule skew mitigation): a host's frontier rows
can be salted across sub-partitions for *fetch* parallelism, but all
grants still route to the single owning shard → one budget per host.
"""

from __future__ import annotations

import ray


def parse_robots_full(text: str) -> tuple[list[str], float | None]:
    """Minimal robots.txt: Disallow prefixes + Crawl-delay (seconds)
    from records whose User-agent set includes '*'.

    Standard grouping: consecutive User-agent lines open ONE record
    shared by all the named agents, so ``User-agent: *\\nUser-agent:
    foo\\nDisallow: /x`` applies /x to '*' (ADVICE r1)."""
    rules: list[str] = []
    delay: float | None = None
    active = False
    in_ua_block = False  # are we still collecting a record's UA lines?
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_ua_block:
                active = active or val == "*"  # same record, add agent
            else:
                active = val == "*"  # a UA line after rules: new record
                in_ua_block = True
        else:
            in_ua_block = False
            if key == "disallow" and active and val:
                rules.append(val)
            elif key == "crawl-delay" and active:
                try:
                    delay = float(val)
                except ValueError:
                    pass
    return rules, delay


def parse_robots(text: str) -> list[str]:
    return parse_robots_full(text)[0]


def robots_allowed(path: str, rules: list[str]) -> bool:
    return not any(path.startswith(r) for r in rules)


class TokenBucket:
    def __init__(self, rate: float, burst: float):
        self.rate = rate
        self.burst = burst
        self.tokens = burst
        self.round = 0

    def refill(self, now_round: int) -> None:
        if now_round > self.round:
            self.tokens = min(self.burst,
                              self.tokens + self.rate * (now_round - self.round))
            self.round = now_round

    def take(self, want: int) -> int:
        got = int(min(self.tokens, want))
        self.tokens -= got
        return got


@ray.remote(num_cpus=0)
class SchedulerShard:
    def __init__(self, fetcher_factory, rate_per_round: float = 4.0,
                 burst: float = 8.0, respect_robots: bool = True,
                 epoch_seconds: float = 1.0):
        self.fetch = fetcher_factory()  # url → Response (robots.txt only)
        self.rate = rate_per_round
        self.burst = burst
        self.respect_robots = respect_robots
        # one BSP round models epoch_seconds of wall time for
        # Crawl-delay: allowed/round = epoch_seconds / delay
        self.epoch_seconds = epoch_seconds
        self.buckets: dict[str, TokenBucket] = {}
        self.robots: dict[str, list[str]] = {}
        self.rejected: int = 0
        self._grant_memo: dict[tuple, list[str]] = {}
        self._memo_round: int = -1

    def _rules(self, host: str) -> list[str]:
        if host not in self.robots:
            if not self.respect_robots:
                self.robots[host] = []
            else:
                resp = self.fetch(f"https://{host}/robots.txt")
                rules, delay = (parse_robots_full(resp.text)
                                if resp.status == 200 else ([], None))
                self.robots[host] = rules
                if delay and delay > 0:
                    # Crawl-delay overrides the default rate ONLY when
                    # it is more conservative than the configured
                    # rate_per_round; a laxer advertised delay leaves
                    # the bucket untouched (ADVICE r1)
                    adv = self.epoch_seconds / delay
                    if adv < self.rate:
                        b = self.buckets.setdefault(
                            host, TokenBucket(self.rate, self.burst))
                        b.rate = min(b.rate, max(adv, 0.001))
                        b.burst = min(b.burst, max(adv, 1.0))
                        b.tokens = min(b.tokens, b.burst)
        return self.robots[host]

    def filter_and_grant(self, host: str, urls: list[str],
                         now_round: int) -> list[str]:
        """urls arrive seq-sorted.  Returns per-URL verdicts:
        'release' | 'defer' | 'robots'.

        Idempotent per (host, round): a retried release task replays the
        original verdicts instead of double-spending the token budget.
        The memo holds the CURRENT round's entries in full (rounds are
        monotonic and barriered — a round's release tasks are drained
        before the next begins, so only same-round retries exist) and
        is purged when a new round starts: never evicts a replayable
        entry, bounded by hosts-per-round (ADVICE r2)."""
        if now_round != self._memo_round:
            self._grant_memo = {}
            self._memo_round = now_round
        memo_key = (host, now_round)
        if memo_key in self._grant_memo:
            return self._grant_memo[memo_key]
        rules = self._rules(host)
        b = self.buckets.setdefault(host, TokenBucket(self.rate, self.burst))
        b.refill(now_round)
        verdicts: list[str] = []
        budget = int(b.tokens)
        granted = 0
        for u in urls:
            rest = u.split("://", 1)[1] if "://" in u else u
            slash = rest.find("/")
            path = rest[slash:] if slash != -1 else "/"
            if not robots_allowed(path, rules):
                verdicts.append("robots")
                self.rejected += 1
            elif granted < budget:
                verdicts.append("release")
                granted += 1
            else:
                verdicts.append("defer")
        b.take(granted)
        self._grant_memo[memo_key] = verdicts
        return verdicts

    def get_rules(self, host: str) -> list[str]:
        """Robots rules for salted (hot-bucket) release tasks: rules are
        fetched/cached once per host here, and the presift tasks apply
        them locally so only top-of-queue candidates ever reach
        filter_and_grant (the Crawl-delay bucket adjustment in _rules
        still runs on this owning shard)."""
        return self._rules(host)

    def add_rejected(self, n: int) -> None:
        """Robots rejections counted by a presift task (observability;
        may double-count if the task is retried)."""
        self.rejected += n

    def stats(self) -> dict:
        return {"hosts": len(self.buckets), "robots_cached": len(self.robots),
                "rejected": self.rejected}
