"""Structured Streaming variants of the stateful operators.

paStash's time-based flush semantics (multiline max_delay, cacheloop maxAge,
ES bulk_timeout) are arrival-time timers on driver-local state
(/root/reference/lib/lib/base_filter_buffer.js:36-51,
 plugins/filters/cacheloop/filter_cacheloop.js:94-97).  The streaming engine
re-expresses them with event-time watermarks + session windows (strictly
stronger: late data has defined semantics, state is bounded and fault
tolerant via checkpointing) and `applyInPandasWithState` for the keyed
mutable-state patterns (lru/gun TTL caches, multiline buffers).
"""
