"""Guided-integrator integration tests: unbiasedness of the mixture
estimator against the unguided PT, and variance improvement from guiding."""
import numpy as np
import pytest

from practical_path_guiding_lab_tpu.render.integrator import PathGuidingIntegrator


@pytest.fixture(scope="module")
def trained(cornell_small):
    """Train 3 iterations (4+8+16 spp) on cornell 64x64."""
    integ = PathGuidingIntegrator(cornell_small)
    integ.setup(kd_capacity=1 << 12, quad_capacity=1 << 16)
    cumm = 0
    for it, spp in [(0, 4), (1, 8), (2, 16)]:
        integ.setIteration(it, False)
        for _ in range(spp):
            integ.render_pass(0, cumm)
            cumm += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    return integ


def _render(integ, iteration, spp, seed):
    integ.setIteration(iteration, True)
    integ.resetVarianceCounter()
    acc = None
    for p in range(spp):
        img, _ = integ.render_pass(seed, p)
        acc = img if acc is None else acc + img
    return np.asarray(acc) / spp


def test_guided_unbiased(trained):
    """Guided and unguided renders must agree in the mean (the guided bias
    bug class this guards: quadrant/pdf inconsistencies)."""
    guided = _render(trained, 3, 24, 11)
    unguided = _render(trained, 0, 24, 12)
    assert abs(guided.mean() / unguided.mean() - 1.0) < 0.05


def test_tree_refined(trained):
    t = trained.tree_prev
    assert t.kd_count > 1
    assert t.q_count > 100
    # npz integrity after training
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        trained.saveSDTreeToFile(f.name)
        trained.loadSDTreeFromFile(f.name)
    assert trained.tree_prev.kd_count == t.kd_count


def test_guided_variance_not_worse(trained):
    """With a trained tree, guided sampling should not increase variance on
    this diffuse scene (usually decreases it)."""
    trained.setIteration(3, True)
    trained.resetVarianceCounter()
    for p in range(8):
        trained.render_pass(21, p)
    var_guided = trained.computeVariance(8)
    trained.setIteration(0, True)
    trained.resetVarianceCounter()
    for p in range(8):
        trained.render_pass(22, p)
    var_unguided = trained.computeVariance(8)
    assert var_guided < var_unguided * 1.5
