"""NutchPublisher extension point (publisher/NutchPublisher.java,
fetcher/FetcherThreadEvent.java, fetcher/FetcherThreadPublisher.java):
the fetcher publishes lifecycle events (START / REPORTING / END) for
external consumers; the reference ships a RabbitMQ implementation
(publish-rabbitmq plugin).

No external message bus in this environment, so the shipped
implementation appends events as JSON lines under a directory
(per-partition files — append-only, resumable, no cross-task state);
the registry seam accepts any object with ``publish(event: dict)`` /
``publish_many(events: list[dict])`` for real-bus clients.

Events are buffered inside the fetch task and flushed once per
partition — zero hot-loop IO, and no cost at all when no publisher is
configured.
"""

from __future__ import annotations

import json
import os


# PublishEventType (fetcher/FetcherThreadEvent.java:28-30)
START, REPORTING, END = "START", "REPORTING", "END"


def event(event_type: str, url: str | None, timestamp_ms: int, **meta) -> dict:
    """FetcherThreadEvent shape: eventType, url, timestamp, metadata."""
    return {
        "eventType": event_type,
        "url": url,
        "timestamp": int(timestamp_ms),
        "metadata": meta,
    }


class JsonlPublisher:
    """File-backed publisher: one ``events-part-{part}.jsonl`` per fetch
    partition under ``out_dir``."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def publish(self, ev: dict) -> None:
        self.publish_many([ev])

    def publish_many(self, events: list[dict]) -> None:
        if not events:
            return
        os.makedirs(self.out_dir, exist_ok=True)
        part = events[0].get("metadata", {}).get("part", 0)
        path = os.path.join(self.out_dir, f"events-part-{part}.jsonl")
        with open(path, "a", encoding="utf-8") as f:
            for ev in events:
                f.write(json.dumps(ev, default=str) + "\n")


_REGISTRY: dict[str, type] = {"jsonl": JsonlPublisher}


def register(name: str, cls: type) -> None:
    _REGISTRY[name] = cls


def get(name: str):
    return _REGISTRY[name]
