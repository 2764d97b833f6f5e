"""Device models as pure vectorized functions over parameter tables.

Each module evaluates one device family's currents/conductances/charges for
*all* instances of that kind at once (arrays over the instance axis), from
(params, linearization voltages, committed state, time/step inputs).  The
index bookkeeping (which matrix entries the values land in) lives in
ops/assemble.py; the math here mirrors the reference's pkg/device/*.go with
deviations documented inline.
"""
