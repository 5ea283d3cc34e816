"""PrefetchIterator: ordering, exception propagation, re-iterability."""

import pytest

from deqsci_tpu.data.prefetch import PrefetchIterator


def test_order_preserved():
    src = list(range(100))
    pf = PrefetchIterator(src, depth=3)
    assert list(pf) == src


def test_reiterable():
    pf = PrefetchIterator([1, 2, 3], depth=1)
    assert list(pf) == [1, 2, 3]
    assert list(pf) == [1, 2, 3]


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("boom")

    class Src:
        def __iter__(self):
            return gen()

    pf = PrefetchIterator(Src(), depth=2)
    it = iter(pf)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_overlap_actually_happens():
    """Producer gets ahead of a slow consumer: after the consumer takes
    one item, the queue (depth 2) should already hold the next items."""
    import time

    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    class Src:
        def __iter__(self):
            return gen()

    it = iter(PrefetchIterator(Src(), depth=2))
    assert next(it) == 0
    time.sleep(0.2)  # let the producer fill the queue
    assert len(produced) >= 3  # item 0 consumed + 2 queued ahead
    assert [next(it) for _ in range(3)] == [1, 2, 3]
