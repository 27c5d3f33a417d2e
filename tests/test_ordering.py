"""ParameterBlockOrdering tests (reference: ordered_groups_test.cc) and
its wiring into the Schur elimination choice."""

import numpy as np
import pytest

import ceres_tpu
from ceres_tpu import ParameterBlockOrdering, SolverOptions
from ceres_tpu.types import LinearSolverType


def test_ordered_groups_surface():
    o = ParameterBlockOrdering()
    assert o.num_elements == 0 and o.num_groups == 0
    assert o.add_element_to_group(5, 1)
    assert o.add_element_to_group(6, 1)
    assert o.add_element_to_group(7, 0)
    assert o.num_elements == 3 and o.num_groups == 2
    assert o.group_id(5) == 1 and o.group_id(7) == 0
    assert o.group_id(99) == -1 and not o.is_member(99)
    assert o.group_size(1) == 2
    assert o.min_non_zero_group() == 0
    assert o.eliminated_blocks() == [7]

    # moving an element between groups
    o.add_element_to_group(5, 0)
    assert o.group_id(5) == 0 and o.group_size(1) == 1
    assert sorted(o.eliminated_blocks()) == [5, 7]

    assert o.remove(5) and not o.remove(5)
    # reference OrderedGroups::Reverse numbering: the largest existing id
    # anchors, previous groups count upward (ordered_groups.h:125-142):
    # {7: 0, 6: 1} -> {6: 1, 7: 2}
    o.reverse()
    assert o.group_id(7) == 2 and o.group_id(6) == 1
    assert o.eliminated_blocks() == [6]

    o.clear()
    assert o.num_elements == 0
    with pytest.raises(ValueError):
        o.min_non_zero_group()
    # negative group ids are rejected with a False return, matching the
    # reference's bool contract (ordered_groups.h AddElementToGroup)
    assert not o.add_element_to_group(1, -1)
    assert not o.is_member(1)


def test_ordering_drives_schur_elimination():
    """Group 0 of a ParameterBlockOrdering pins the eliminated blocks,
    matching the flat-sequence linear_solver_ordering path."""
    from ceres_tpu.io.bal import synthetic_bal, build_ba_problem

    bal = synthetic_bal(3, 24, 96, seed=5)
    problem, cams, pts = build_ba_problem(bal)
    ordering = ParameterBlockOrdering()
    for h in pts:
        ordering.add_element_to_group(int(h), 0)   # eliminate points
    for h in cams:
        ordering.add_element_to_group(int(h), 1)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        linear_solver_ordering=ordering,
        max_num_iterations=5,
    )
    s = ceres_tpu.solve(options, problem)
    assert s.termination_type.value in ("CONVERGENCE", "NO_CONVERGENCE")
    assert s.final_cost <= s.initial_cost
