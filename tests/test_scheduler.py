"""Scale-scheduler tests (SURVEY.md C12): all four distribution types,
score updates, checkpoint round-trip."""

import numpy as np
import pytest

from dynseg.config import SchedulerConfig
from dynseg.sched.scheduler import ScaleScheduler


def test_single_fixed():
    s = ScaleScheduler(SchedulerConfig(distribution_type="single_fixed", values=(25, 35)))
    assert all(s.select() == 25 for _ in range(10))


def test_multi_fixed_cycles():
    s = ScaleScheduler(SchedulerConfig(distribution_type="multi_fixed", values=(25, 35, 45)))
    assert [s.select() for _ in range(6)] == [25, 35, 45, 25, 35, 45]


def test_uniform_hits_all_values():
    s = ScaleScheduler(SchedulerConfig(distribution_type="uniform", values=(25, 35, 45)), seed=0)
    seen = {s.select() for _ in range(200)}
    assert seen == {25, 35, 45}


def test_uniform_support_is_the_values_list_not_the_range():
    """Pins the semantic the verify-on-mount fact `uniform-support`
    (scripts/verify_reference.py; VERDICT r3 #7) documents: our
    `uniform` samples uniformly over the --values LIST. The SURVEY C12
    wording 'uniform over range' admits a second reading (uniform over
    the 25..65 INTEGER range) which would feed never-bucketed patch
    sizes — if the reference source turns out to mean that, this test
    marks the exact behavior to change."""
    s = ScaleScheduler(SchedulerConfig(distribution_type="uniform",
                                       values=(25, 65)), seed=3)
    draws = {s.select() for _ in range(500)}
    assert draws == {25, 65}  # never 26..64 — list support, not range


def test_multinomial_favors_high_accuracy_scale():
    cfg = SchedulerConfig(
        distribution_type="multinomial", values=(25, 35, 45),
        update_type="acc", favor_high_score=True, ema=0.5,
    )
    s = ScaleScheduler(cfg, seed=0)
    for _ in range(20):
        s.update(25, loss=1.0, acc=0.9)
        s.update(35, loss=1.0, acc=0.3)
        s.update(45, loss=1.0, acc=0.3)
    p = s.probabilities()
    assert p[0] > p[1] and p[0] > p[2]
    assert s.best_scales(1) == [25]
    draws = np.array([s.select() for _ in range(500)])
    assert (draws == 25).mean() > 0.5


def test_multinomial_loss_mode_inverts():
    cfg = SchedulerConfig(
        distribution_type="multinomial", values=(25, 35),
        update_type="loss", favor_high_score=True, ema=0.5,
    )
    s = ScaleScheduler(cfg, seed=0)
    for _ in range(20):
        s.update(25, loss=0.1, acc=0.0)   # low loss = good
        s.update(35, loss=2.0, acc=0.0)
    p = s.probabilities()
    assert p[0] > p[1]


def test_favor_low_score_bracket():
    # the bracketable sign convention (SURVEY.md §7 hard part 1)
    cfg = SchedulerConfig(
        distribution_type="multinomial", values=(25, 35),
        update_type="acc", favor_high_score=False, ema=0.5,
    )
    s = ScaleScheduler(cfg, seed=0)
    for _ in range(20):
        s.update(25, loss=0.0, acc=0.9)
        s.update(35, loss=0.0, acc=0.3)
    p = s.probabilities()
    assert p[1] > p[0]  # struggling scale trained harder


def test_unvisited_scales_get_optimistic_mass():
    cfg = SchedulerConfig(distribution_type="multinomial", values=(25, 35, 45))
    s = ScaleScheduler(cfg, seed=0)
    p0 = s.probabilities()
    np.testing.assert_allclose(p0, [1 / 3] * 3)
    s.update(25, loss=1.0, acc=0.5)
    p1 = s.probabilities()
    assert p1[1] > 0.05 and p1[2] > 0.05  # exploration preserved


def test_no_starvation():
    """A scale with a worse-but-finite score keeps meaningful probability
    mass — normalized raw scores, not min-subtracted (which starves)."""
    cfg = SchedulerConfig(
        distribution_type="multinomial", values=(25, 35),
        update_type="acc", favor_high_score=True, ema=0.9,
    )
    s = ScaleScheduler(cfg, seed=0)
    s.update(35, loss=1.0, acc=0.487)  # visited once, mediocre
    for _ in range(50):
        s.update(25, loss=0.1, acc=0.985)
    p = s.probabilities()
    assert p[1] > 0.25, p  # ≈ 0.487/(0.487+0.985) ≈ 0.33, never ~0


def test_nonfinite_feedback_never_poisons_distribution():
    """Review r2: a diverged (inf/nan) loss under favor_high_score=False
    made fitness inf and probabilities NaN, crashing rng.choice."""
    cfg = SchedulerConfig(distribution_type="multinomial", values=(25, 65),
                          update_type="loss", favor_high_score=False)
    s = ScaleScheduler(cfg, seed=0)
    s.update(25, loss=0.5, acc=0.0)
    s.update(65, loss=float("inf"), acc=0.0)   # divergence feedback
    p = np.asarray(s.probabilities())
    assert np.all(np.isfinite(p)) and abs(p.sum() - 1.0) < 1e-9
    assert s.select() in (25, 65)
    # inf never entered the EMA: a later finite update recovers cleanly
    s.update(65, loss=float("nan"), acc=0.0)
    s.update(65, loss=1.0, acc=0.0)
    assert np.isfinite(s._scores[65]) and s._scores[65] == 1.0
    assert np.all(np.isfinite(np.asarray(s.probabilities())))


def test_state_dict_roundtrip():
    cfg = SchedulerConfig(distribution_type="multinomial", values=(25, 35))
    a = ScaleScheduler(cfg, seed=3)
    for i in range(5):
        a.update(a.select(), loss=float(i), acc=0.1 * i)
    st = a.state_dict()
    b = ScaleScheduler(cfg, seed=999)
    b.load_state_dict(st)
    assert not b.semantics_adopted
    np.testing.assert_allclose(a.probabilities(), b.probabilities())
    assert [a.select() for _ in range(10)] == [b.select() for _ in range(10)]


def test_restore_adopts_checkpoint_semantics():
    """Review r2: a table trained under one score convention must be
    RANKED under that convention after restore, even when the restoring
    CLI's defaults differ — else best_scales()/top-K fusion silently
    inverts (favor) or misreads losses as accuracies (update_type)."""
    trained = SchedulerConfig(distribution_type="multinomial",
                              values=(25, 65), update_type="loss",
                              favor_high_score=True)
    a = ScaleScheduler(trained, seed=0)
    for _ in range(20):  # 25 px has LOW loss -> best under loss/high
        a.update(25, loss=0.1, acc=0.0)
        a.update(65, loss=2.0, acc=0.0)
    assert a.best_scales(1) == [25]

    cli_default = SchedulerConfig(distribution_type="multinomial",
                                  values=(25, 65), update_type="acc",
                                  favor_high_score=True)
    b = ScaleScheduler(cli_default, seed=1)
    b.load_state_dict(a.state_dict())
    # under the WRONG (acc) reading, score 2.0 > 0.1 would rank 65 first
    assert b.best_scales(1) == [25]
    assert b.semantics_adopted == {"update_type": ("loss", "acc")}
    assert b.cfg.update_type == "loss"

    # favor flip is likewise adopted and reported
    low = ScaleScheduler(
        SchedulerConfig(distribution_type="multinomial", values=(25, 65),
                        update_type="loss", favor_high_score=False), seed=2)
    low.load_state_dict(a.state_dict())
    assert low.semantics_adopted["favor_high_score"] == (True, False)
    assert low.best_scales(1) == [25]

    # pre-r2 checkpoints without the keys: nothing adopted
    legacy = a.state_dict()
    del legacy["update_type"], legacy["favor_high_score"]
    c = ScaleScheduler(cli_default, seed=3)
    c.load_state_dict(legacy)
    assert not c.semantics_adopted and c.cfg.update_type == "acc"


# --------------------------------------------------------------------- #
# multinomial_stratified (round 3, beyond-reference): deterministic
# largest-deficit scheduling over the score-derived probabilities.
# --------------------------------------------------------------------- #

def test_stratified_flat_scores_is_round_robin():
    """With no feedback (uniform optimistic p) stratified selection must
    degenerate to multi_fixed's deterministic cycle — by construction it
    can never do worse than cycling when scores carry no signal."""
    s = ScaleScheduler(SchedulerConfig(
        distribution_type="multinomial_stratified", values=(25, 35, 45)))
    assert [s.select() for _ in range(9)] == [25, 35, 45] * 3


def test_stratified_allocation_tracks_probabilities():
    """At a fixed skewed score table, served counts stay within 1 step of
    exact proportionality p_i * t (the WRR/Bresenham bound) — the
    reallocation the iid multinomial does in expectation, without its
    visitation variance."""
    cfg = SchedulerConfig(
        distribution_type="multinomial_stratified", values=(25, 35, 45),
        update_type="acc", favor_high_score=True, ema=0.5,
    )
    s = ScaleScheduler(cfg, seed=0)
    for _ in range(30):  # pin a skewed table: 0.9 / 0.3 / 0.6
        s.update(25, loss=1.0, acc=0.9)
        s.update(35, loss=1.0, acc=0.3)
        s.update(45, loss=1.0, acc=0.6)
    p = s.probabilities()
    served = {v: 0 for v in cfg.values}
    for t in range(1, 601):
        served[s.select()] += 1
        for i, v in enumerate(cfg.values):
            assert abs(served[v] - p[i] * t) <= 1.0 + 1e-9, (t, v, served)
    # and the best scale really is served most
    assert served[25] > served[45] > served[35]


def test_stratified_adapts_online():
    """The credit schedule re-reads the live table each step: when the
    scores flip mid-run, the allocation flips with them — AND the
    post-flip window tracks the NEW p, not a history-weighted blend.
    A count-ordering assertion alone would mask the cumulative-deficit
    bug (review r3): after a flip that form serves ONLY the newly
    favored scale for ~all-elapsed-steps, which still 'wins' the count
    while starving the other scale entirely."""
    cfg = SchedulerConfig(
        distribution_type="multinomial_stratified", values=(25, 65),
        update_type="acc", favor_high_score=True, ema=0.0,  # ema=0: score = last metric
    )
    s = ScaleScheduler(cfg, seed=0)
    s.update(25, loss=1.0, acc=0.9)
    s.update(65, loss=1.0, acc=0.1)
    p_hi = max(s.probabilities())  # 0.9 at T=1 — both rates measurable
    first = [s.select() for _ in range(40)]
    assert first.count(25) > first.count(65)
    s.update(25, loss=1.0, acc=0.1)
    s.update(65, loss=1.0, acc=0.9)
    second = [s.select() for _ in range(40)]
    assert second.count(65) > second.count(25)
    # WRR bound at the new (fixed) p, +1 slack for bounded pre-flip
    # credits: both scales are served at ~their current rate.
    assert abs(second.count(65) - p_hi * 40) <= 2.0
    assert second.count(25) >= 1


def test_stratified_no_history_lockout_after_score_shift():
    """Regression (review r3): a LONG skewed history followed by a score
    flip must not starve the newly-disfavored scale for a stretch
    proportional to elapsed steps. The cumulative-deficit form
    (p_i*t_total − served_total) fails this: after 1000 steps at
    p≈(0.9,0.1) and a flip, it selects scale 65 exclusively for
    thousands of steps. Credits are bounded, so adaptation happens at
    the new rates immediately regardless of history length."""
    cfg = SchedulerConfig(
        distribution_type="multinomial_stratified", values=(25, 65),
        update_type="acc", favor_high_score=True, ema=0.0,
    )
    s = ScaleScheduler(cfg, seed=0)
    s.update(25, loss=1.0, acc=0.9)
    s.update(65, loss=1.0, acc=0.1)
    for _ in range(1000):
        s.select()
    s.update(25, loss=1.0, acc=0.1)
    s.update(65, loss=1.0, acc=0.9)
    p = s.probabilities()  # now (0.1, 0.9) at T=1
    window = [s.select() for _ in range(50)]
    # the minority scale is visited at ~its current rate within ONE
    # short window, not after a history-sized drought
    assert window.count(25) >= int(min(p) * 50) - 2
    assert window.count(25) >= 1
    assert window.count(65) > window.count(25)


def test_stratified_state_roundtrip_continues_schedule():
    """Resume parity: restoring the deficit counters mid-cycle must
    continue the EXACT selection sequence (same guarantee multi_fixed
    gets from its cycle counter)."""
    cfg = SchedulerConfig(
        distribution_type="multinomial_stratified", values=(25, 35, 45))
    a = ScaleScheduler(cfg, seed=3)
    for i in range(7):  # stop mid-cycle on purpose
        a.update(a.select(), loss=1.0, acc=0.2 + 0.1 * (i % 3))
    st = a.state_dict()
    b = ScaleScheduler(cfg, seed=999)
    b.load_state_dict(st)
    assert [a.select() for _ in range(20)] == [b.select() for _ in range(20)]


def test_stratified_pre_r3_checkpoint_loads():
    """Checkpoints written before the WRR credits existed must load
    (fresh zero credits), so old runs can resume INTO the new mode."""
    old = ScaleScheduler(SchedulerConfig(
        distribution_type="multinomial", values=(25, 35)), seed=0)
    for _ in range(5):
        old.update(old.select(), loss=1.0, acc=0.5)
    st = old.state_dict()
    del st["credit"]  # simulate a pre-r3 checkpoint
    s = ScaleScheduler(SchedulerConfig(
        distribution_type="multinomial_stratified", values=(25, 35)), seed=0)
    s.load_state_dict(st)
    picks = [s.select() for _ in range(4)]
    assert set(picks) == {25, 35}  # credit clock restarts cleanly
