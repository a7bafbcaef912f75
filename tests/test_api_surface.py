"""API-surface parity: every public function the reference declares must
have a drop-in counterpart in mi_fieldcalc_tpu.api.

Parses the reference header's declarations directly (FieldCalculations.h
+ the vessel-icing declarations it contains) so the parity claim in
COMPONENTS.md is machine-checked, not hand-maintained.  Skipped when the
read-only reference checkout is absent (the rest of the suite runs from
committed goldens).
"""

import os
import re

import pytest

_HEADER = "/root/reference/src/mi_fieldcalc/FieldCalculations.h"

#: reference name -> api name where they differ (none today; the drop-in
#: surface keeps the C++ spelling, including camelCase)
_RENAMES = {}

#: declared in the header but intentionally not part of the drop-in
#: surface, with the reason (recorded in COMPONENTS.md too)
_EXCLUDED = {
    "is_defined",      # point predicate -> mask lanes (field.from_sentinel)
}


def _declared_functions():
    src = open(_HEADER).read()
    # strip comments so commented-out declarations don't count
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    src = re.sub(r"//[^\n]*", "", src)
    names = re.findall(
        r"^\s*(?:bool|void|float|int)\s+([a-zA-Z_][a-zA-Z0-9_]*)\s*\(",
        src, flags=re.M)
    return sorted(set(names) - _EXCLUDED)


@pytest.mark.skipif(not os.path.exists(_HEADER),
                    reason="reference checkout not present")
def test_every_reference_function_is_covered():
    import mi_fieldcalc_tpu.api as api

    declared = _declared_functions()
    assert len(declared) >= 60, "header parse looks broken"
    missing = [n for n in declared
               if not hasattr(api, _RENAMES.get(n, n))]
    assert not missing, f"reference functions without api counterpart: {missing}"
