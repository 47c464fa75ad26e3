"""Pure-Python pins for the generation-cache policy (functions/cachegen.py):
LRU capacity, same-key replacement, path-overlap eviction, dead-session
invalidation — no SparkSession needed (stub frames)."""

from __future__ import annotations

from marketstream_etl_spark.functions import cachegen


class _StubCtx:
    def __init__(self, app_id):
        self.applicationId = app_id


class _StubSession:
    def __init__(self, app_id):
        self.sparkContext = _StubCtx(app_id)


class _StubFrame:
    def __init__(self, app_id="app-1"):
        self.unpersisted = False
        self.sparkSession = _StubSession(app_id)

    def unpersist(self):
        self.unpersisted = True


def setup_function(_fn):
    cachegen.clear()


def teardown_function(_fn):
    cachegen.clear()


def test_lru_capacity_evicts_oldest():
    frames = [_StubFrame() for _ in range(3)]
    for i, f in enumerate(frames):
        cachegen.rotate("fam", i, [f], frozenset({f"/p{i}"}))
    assert frames[0].unpersisted  # beyond capacity 2
    assert not frames[1].unpersisted and not frames[2].unpersisted
    assert cachegen.lookup("fam", 0) is None
    assert cachegen.lookup("fam", 1) == [frames[1]]
    assert cachegen.lookup("fam", 2) == [frames[2]]


def test_lookup_refreshes_lru_position():
    a, b, c = _StubFrame(), _StubFrame(), _StubFrame()
    cachegen.rotate("fam", 1, [a], frozenset({"/a"}))
    cachegen.rotate("fam", 2, [b], frozenset({"/b"}))
    cachegen.lookup("fam", 1)  # refresh 1 → 2 becomes LRU
    cachegen.rotate("fam", 3, [c], frozenset({"/c"}))
    assert b.unpersisted and not a.unpersisted


def test_same_key_replacement_does_not_unpersist():
    a, b = _StubFrame(), _StubFrame()
    cachegen.rotate("fam", 1, [a])
    cachegen.rotate("fam", 1, [b])  # same plans → same backing storage
    assert not a.unpersisted
    assert cachegen.lookup("fam", 1) == [b]


def test_path_overlap_evicts_rewritten_generation():
    # in-place rewrite: new key, same path — the old generation's cached
    # blocks would be plan-matched by CacheManager and served stale
    old, new = _StubFrame(), _StubFrame()
    cachegen.rotate("fam", 1, [old], frozenset({"/data/docs.parquet"}))
    cachegen.rotate("fam", 2, [new], frozenset({"/data/docs.parquet"}))
    assert old.unpersisted
    assert cachegen.lookup("fam", 1) is None
    assert cachegen.lookup("fam", 2) == [new]


def test_disjoint_paths_coexist():
    a, b = _StubFrame(), _StubFrame()
    cachegen.rotate("fam", 1, [a], frozenset({"/ds1/docs.parquet"}))
    cachegen.rotate("fam", 2, [b], frozenset({"/ds2/docs.parquet"}))
    assert not a.unpersisted and not b.unpersisted
    assert cachegen.lookup("fam", 1) == [a]


def test_dead_session_hit_is_dropped():
    stale = _StubFrame(app_id="app-old")
    cachegen.rotate("fam", 1, [stale], frozenset({"/p"}))
    probe = _StubFrame(app_id="app-new")  # caller from a NEW session
    assert cachegen.lookup("fam", 1, current=probe) is None
    # and the dead handles were dropped, not retried forever
    assert cachegen.lookup("fam", 1) is None


def test_same_session_hit_survives_validation():
    f = _StubFrame(app_id="app-1")
    cachegen.rotate("fam", 1, [f], frozenset({"/p"}))
    probe = _StubFrame(app_id="app-1")
    assert cachegen.lookup("fam", 1, current=probe) == [f]


def test_unverifiable_input_never_serves_cache():
    # listing failure -> key 0 (UNVERIFIABLE): rotate stores, lookup refuses
    f1, f2 = _StubFrame(), _StubFrame()
    cachegen.rotate("fam", cachegen._UNVERIFIABLE, [f1])
    assert cachegen.lookup("fam", cachegen._UNVERIFIABLE) is None
    # a repeat rotate under the sentinel unpersists the orphaned frames
    cachegen.rotate("fam", cachegen._UNVERIFIABLE, [f2])
    assert f1.unpersisted and not f2.unpersisted


def test_obj_cache_roundtrip_and_lru():
    cachegen.obj_rotate("cb", (1, 16), {"a": 1})
    cachegen.obj_rotate("cb", (2, 16), {"b": 2})
    assert cachegen.obj_lookup("cb", (1, 16)) == {"a": 1}  # refresh 1
    cachegen.obj_rotate("cb", (3, 16), {"c": 3})  # evicts (2,16), the LRU
    assert cachegen.obj_lookup("cb", (2, 16)) is None
    assert cachegen.obj_lookup("cb", (1, 16)) == {"a": 1}
    assert cachegen.obj_lookup("cb", (3, 16)) == {"c": 3}


def test_obj_cache_unverifiable_key_never_served():
    key = (cachegen._UNVERIFIABLE, 16)
    cachegen.obj_rotate("cb", key, {"x": 1})
    assert cachegen.obj_lookup("cb", key) is None


def test_obj_cache_zero_key_component_is_cacheable():
    # r8 ADVICE: the old sentinel was the int 0, so any legitimate 0 in a
    # composite key (hyperparameter, False, hash landing on 0) silently
    # made the entry uncacheable.  The object() sentinel fixes that.
    cachegen.obj_rotate("cb0", (0, 16, False), {"x": 1})
    assert cachegen.obj_lookup("cb0", (0, 16, False)) == {"x": 1}


def test_obj_cache_nested_unverifiable_refused():
    key = ((cachegen._UNVERIFIABLE, "inner"), 16)
    cachegen.obj_rotate("cbn", key, {"x": 1})
    assert cachegen.obj_lookup("cbn", key) is None


def test_obj_rotate_drops_unverifiable_instead_of_burning_slot():
    # capacity is GENERATIONS_PER_FAMILY (2): an unverifiable rotate must
    # not evict a servable generation
    cachegen.obj_rotate("cbs", (1,), "a")
    cachegen.obj_rotate("cbs", (2,), "b")
    cachegen.obj_rotate("cbs", (cachegen._UNVERIFIABLE,), "never")
    assert cachegen.obj_lookup("cbs", (1,)) == "a"
    assert cachegen.obj_lookup("cbs", (2,)) == "b"


def test_obj_cache_cleared_with_families():
    cachegen.obj_rotate("cb", (9,), {"z": 1})
    cachegen.clear()
    assert cachegen.obj_lookup("cb", (9,)) is None
