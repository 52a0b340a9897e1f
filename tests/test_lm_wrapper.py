"""LM wrapper contract tests (modeled on the reference's
LMWrapperTemplate, reference: test/test_decoding/test_lm_wrapper.py):
batched state advancement, HiddenState indexing/assignment/concat,
line-context seeding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_ocr_tpu.decoding.lm_wrapper import HiddenState, JAXLMWrapper
from pero_ocr_tpu.models.charlm import CharLM, CharLMSpec

SYMBOLS = ["a", "b", "c"]


@pytest.fixture(scope="module", params=["lstm", "gru"])
def wrapper(request):
    spec = CharLMSpec(vocab_size=4, embed_dim=4, hidden_dim=6,
                      num_layers=2, cell_type=request.param)
    model = CharLM(spec)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32))
    return JAXLMWrapper(model, variables, SYMBOLS)


class TestWrapperContract:
    def test_initial_h_batch(self, wrapper):
        h = wrapper.initial_h(3)
        assert h.batch_size() == 3
        lp = wrapper.log_probs(h)
        assert lp.shape == (3, 3)  # decoder symbols only
        # All rows identical (same </s> context).
        np.testing.assert_allclose(lp[0], lp[1], atol=1e-6)

    def test_advance_changes_distribution(self, wrapper):
        h = wrapper.initial_h(2)
        lp0 = wrapper.log_probs(h)
        h2 = wrapper.advance_h0(np.array([0, 1]), h)
        lp1 = wrapper.log_probs(h2)
        assert not np.allclose(lp0, lp1)
        # Different chars -> different states.
        assert not np.allclose(lp1[0], lp1[1])

    def test_batch_order_independence(self, wrapper):
        """Advancing [a, b] must equal advancing a and b separately."""
        h = wrapper.initial_h(2)
        both = wrapper.log_probs(wrapper.advance_h0(np.array([0, 1]), h))
        single_a = wrapper.log_probs(
            wrapper.advance_h0(np.array([0]), wrapper.initial_h(1))
        )
        single_b = wrapper.log_probs(
            wrapper.advance_h0(np.array([1]), wrapper.initial_h(1))
        )
        np.testing.assert_allclose(both[0], single_a[0], atol=1e-5)
        np.testing.assert_allclose(both[1], single_b[0], atol=1e-5)

    def test_eos_scores(self, wrapper):
        h = wrapper.initial_h(2)
        scores = wrapper.eos_scores(h)
        assert scores.shape == (2,)
        assert np.all(scores < 0)

    def test_add_line_end(self, wrapper):
        h = wrapper.initial_h(1)
        h2 = wrapper.add_line_end(h)
        assert not np.allclose(
            wrapper.log_probs(h), wrapper.log_probs(h2)
        )

    def test_initial_h_from_line(self, wrapper):
        """Seeding with a previous line must equal stepping it manually
        (reference CARRY_H_OVER contract, lm_wrapper.py:116-124)."""
        h_seeded = wrapper.initial_h_from_line("ab")
        h_manual = wrapper.initial_h(1)
        h_manual = wrapper.advance_h0(np.array([0]), h_manual)
        h_manual = wrapper.advance_h0(np.array([1]), h_manual)
        h_manual = wrapper.add_line_end(h_manual)
        np.testing.assert_allclose(
            wrapper.log_probs(h_seeded), wrapper.log_probs(h_manual), atol=1e-5
        )


class TestHiddenState:
    def _state(self, n=4):
        tree = ((np.arange(n * 2, dtype=np.float32).reshape(n, 2),
                 np.arange(n * 2, dtype=np.float32).reshape(n, 2) + 100),)
        return HiddenState(tree)

    def test_getitem(self):
        h = self._state()
        sub = h[[2, 0]]
        assert sub.batch_size() == 2
        np.testing.assert_allclose(sub.tree[0][0][0], [4, 5])

    def test_setitem(self):
        h = self._state()
        h[[0]] = self._state(1)
        np.testing.assert_allclose(h.tree[0][1][0], [100, 101])

    def test_concat(self):
        h = self._state(2) + self._state(3)
        assert h.batch_size() == 5

    def test_concat_empty(self):
        h = self._state(0) + self._state(3)
        assert h.batch_size() == 3
