"""Tests for ContactParams validation and tuple emission.

Modeled on flygym ``tests/core/test_physics.py``.
"""

import dataclasses

import pytest

pytestmark = pytest.mark.fast

from flygym_tpu.compose.physics import ContactParams


class TestDefaults:
    def test_fly_tuned_defaults(self):
        p = ContactParams()
        assert p.sliding_friction == 1.0
        assert p.torsional_friction == 2e-2
        assert p.rolling_friction == 1e-4
        assert p.solver_refaccl_timeconst == 2e-4
        assert p.margin == 1e-3
        assert p.is_valid()


class TestTuples:
    def test_friction_tuple(self):
        p = ContactParams(sliding_friction=2.0)
        assert p.get_friction_tuple() == (2.0, 2.0, 2e-2, 1e-4, 1e-4)

    def test_solref_tuple(self):
        assert ContactParams().get_solref_tuple() == (2e-4, 1.0)

    def test_solimp_tuple(self):
        assert ContactParams().get_solimp_tuple() == (0.98, 0.99, 0.5, 3.0)

    def test_solimp_full_tuple(self):
        assert ContactParams().get_solimp_full_tuple() == (0.98, 0.99, 1e-5, 0.5, 3.0)


@pytest.mark.parametrize(
    "field,value",
    [
        ("sliding_friction", -1.0),
        ("torsional_friction", -0.1),
        ("rolling_friction", -0.1),
        ("solver_refaccl_timeconst", 0.0),
        ("solver_refaccl_dampratio", -1.0),
        ("solver_impedance_min", 0.0),
        ("solver_impedance_min", 1.0),
        ("solver_impedance_max", 1.5),
        ("solver_impedance_min2max_width", 0.0),
        ("solver_impedance_transitionmidpoint", 0.0),
        ("solver_impedance_transitionsharpness", 0.5),
    ],
)
def test_invalid_values_raise(field, value):
    p = dataclasses.replace(ContactParams(), **{field: value})
    with pytest.raises(ValueError):
        p.is_valid()
    assert p.is_valid(raise_on_invalid=False) is False


def test_max_less_than_min_invalid():
    p = ContactParams(solver_impedance_min=0.9, solver_impedance_max=0.5)
    assert not p.is_valid(raise_on_invalid=False)
