"""Lazy mask algebra, fused into jitted kernels.

Functional re-design of the reference mask subsystem
(``/root/reference/spectral_cube/masks.py``): masks are immutable expression
trees whose ``include(data)`` lowers to pure jnp ops, so every consumer
(reductions, moments, transforms) fuses the predicate into its kernel via
``jnp.where`` instead of materializing filled copies (the reference's
``_filled`` at masks.py:197 allocates a full masked copy per op).

Node types mirror the reference one-for-one:

- :class:`BooleanArrayMask`  (masks.py:457)  — concrete bool array + WCS,
  broadcasting 1-D spectral / 2-D spatial masks to cube shape.
- :class:`LazyMask`          (masks.py:586)  — ``function(data)``.
- :class:`LazyComparisonMask`(masks.py:670)  — ``function(data, value)``,
  what ``cube > 3*u.K`` builds.
- :class:`FunctionMask`      (masks.py:760)  — ``function(data, wcs, view)``.
- :class:`CompositeMask` / :class:`InvertedMask` (masks.py:364/:337) —
  ``& | ^ ~`` build lazy composites.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
import jax.numpy as jnp

__all__ = ["MaskBase", "InvertedMask", "CompositeMask", "BooleanArrayMask",
           "LazyMask", "LazyComparisonMask", "FunctionMask",
           "is_broadcastable_and_smaller", "dims_to_skip", "view_of_subset"]


def trivial_view(view) -> bool:
    """True when ``view`` selects everything.  Must NOT be written as
    ``view in ((), None)``: an ndarray view would broadcast-compare."""
    return view is None or (isinstance(view, tuple) and len(view) == 0)


def is_data_local(mask) -> bool:
    """True if the mask expression depends only on the data values at each
    voxel (no stored boolean arrays, no wcs/view-dependent functions).

    Data-local expressions can be evaluated *inside* a Pallas kernel on each
    VMEM-resident block, so the predicate fuses with the reduction and the
    mask is never materialized in HBM — the TPU answer to the reference's
    ``_filled`` copies.
    """
    if mask is None:
        return True
    if isinstance(mask, LazyComparisonMask):
        # array-valued thresholds (per-channel cuts) are positional, not
        # per-voxel: a Pallas block would compare against the wrong slice
        return np.ndim(mask._comparison_value) == 0
    if isinstance(mask, LazyMask):
        return True
    if isinstance(mask, InvertedMask):
        return is_data_local(mask._mask)
    if isinstance(mask, CompositeMask):
        return is_data_local(mask._mask1) and is_data_local(mask._mask2)
    return False


def _fn_key(fn, fallback):
    """Key a predicate function by OBJECT (identity hash + a pinned
    strong reference via the cache key).  Keying by __name__ collided
    two different lambdas (both '<lambda>') and served the first
    cube's compiled mask to the second; keying by bare id() could
    silently alias after garbage collection."""
    try:
        hash(fn)
        return fn
    except TypeError:
        return fallback


def expr_key(mask):
    """A hashable structural key for a data-local mask expression, for
    caching compiled kernels that fuse the predicate (same structure +
    parameters => same lowered program).  Shared singletons like
    ``jnp.greater``/``np.isfinite`` still share cache entries; distinct
    function objects never collide."""
    if mask is None:
        return None
    if isinstance(mask, LazyComparisonMask):
        cv = mask._comparison_value
        try:
            cv_key = float(cv)
        except (TypeError, ValueError):
            # array-valued comparisons (per-channel thresholds): key on
            # the bytes so equal arrays share compiled kernels
            cva = np.asarray(cv)
            cv_key = (cva.shape, str(cva.dtype), cva.tobytes())
        return ("cmp", _fn_key(mask._function, mask), cv_key)
    if isinstance(mask, LazyMask):
        return ("fn", _fn_key(mask._function, mask))
    if isinstance(mask, InvertedMask):
        return ("not", expr_key(mask._mask))
    if isinstance(mask, CompositeMask):
        return (mask._operation, expr_key(mask._mask1),
                expr_key(mask._mask2))
    return ("obj", mask)


def is_broadcastable_and_smaller(shape1, shape2):
    """True if an array of ``shape1`` can broadcast to ``shape2`` without
    expanding shape2 (reference masks.py:38-49)."""
    if len(shape1) > len(shape2):
        return False
    for a, b in zip(shape1[::-1], shape2[::-1]):
        if a not in (1, b):
            return False
    return True


def dims_to_skip(shape1, shape2):
    """Axes of shape2 not covered by shape1 (reference masks.py:51-77)."""
    if not is_broadcastable_and_smaller(shape1, shape2):
        raise ValueError(f"cannot broadcast {shape1} to {shape2}")
    ndiff = len(shape2) - len(shape1)
    skip = list(range(ndiff))
    for i, (a, b) in enumerate(zip(shape1, shape2[ndiff:])):
        if a == 1 and b != 1:
            skip.append(i + ndiff)
    return skip


def view_shape(shape, view):
    """Shape of ``full_array[view]`` computed allocation-free (a real
    np.empty(shape)[view] would malloc the whole cube just to read
    .shape; a fancy-index view would even touch the pages)."""
    probe = np.broadcast_to(np.empty((), dtype=bool), tuple(shape))
    return np.asarray(probe[view]).shape if not trivial_view(view) \
        else tuple(shape)


def view_of_subset(view, shape_full, shape_sub):
    """Restrict a cube view to the axes present in a smaller mask array
    (reference masks.py:79-99)."""
    if trivial_view(view):
        return ()
    skip = dims_to_skip(shape_sub, shape_full)
    view = _normalize_view(view, len(shape_full))
    return tuple(v for i, v in enumerate(view) if i not in skip)


def _normalize_view(view, ndim):
    if view is None:
        view = ()
    if not isinstance(view, tuple):
        view = (view,)
    view = view + (slice(None),) * (ndim - len(view))
    return view


def _convert_wcs_spectral(wcs, unit, velocity_convention, rest_value):
    """Convert a mask's stored WCS spectral axis (the cube
    with_spectral_unit math, reference masks.py:313-334 _get_new_wcs)."""
    from .units import Unit
    from .wcs.spectral import (determine_ctype_from_vconv,
                               convert_spectral_axis)
    unit = Unit.parse(unit) if isinstance(unit, str) else unit
    out_ctype = determine_ctype_from_vconv(
        wcs.ctype[2], unit, velocity_convention=velocity_convention)
    return convert_spectral_axis(wcs, unit, out_ctype, rest_value=rest_value)


class MaskBase(ABC):
    """Boolean include/exclude semantics over cube-shaped data."""

    @abstractmethod
    def _include(self, data=None, view=()):
        """Return the boolean *include* array for ``data[view]``."""

    def include(self, data=None, wcs=None, view=()):
        """Boolean include array.  ``wcs`` flows through to nodes whose
        predicate wants it (FunctionMask, reference masks.py:788-792);
        other node types ignore it."""
        if wcs is not None and self._wants_wcs():
            return self._include(data=data, view=view, wcs=wcs)
        return self._include(data=data, view=view)

    def _wants_wcs(self):
        """True if this node (or a child) takes a call-time wcs."""
        return False

    def exclude(self, data=None, wcs=None, view=()):
        if wcs is not None and self._wants_wcs():
            inc = self._include(data=data, view=view, wcs=wcs)
        else:
            inc = self._include(data=data, view=view)
        if isinstance(inc, np.ndarray):
            return ~inc
        return jnp.logical_not(inc)

    @property
    def shape(self):
        return getattr(self, "_shape", None)

    @property
    def ndim(self):
        """Number of dimensions (reference masks.py:257)."""
        shp = self.shape
        return None if shp is None else len(shp)

    @property
    def size(self):
        """Total element count (reference masks.py:261)."""
        shp = self.shape
        return None if shp is None else int(np.prod(shp))

    @property
    def dtype(self):
        """Masks are boolean (reference masks.py:265)."""
        return np.dtype("bool")

    # -- data access -------------------------------------------------------
    def _filled(self, data, wcs=None, fill=np.nan, view=(), xp=jnp):
        """Mask-filled data: data where included, ``fill`` elsewhere.

        Unlike the reference (masks.py:197-237, which allocates an np.ma
        masked copy, optionally memmapped), this is a pure jnp.where that
        XLA fuses into whatever kernel consumes it.
        """
        view = () if view is None else view
        sub = data if trivial_view(view) else data[view]
        inc = self._include(data=data, view=view)
        return xp.where(inc, sub, xp.asarray(fill, dtype=sub.dtype))

    def _flattened(self, data, wcs=None, view=()):
        """1-D array of included values (host-side; dynamic shape)."""
        view = () if view is None else view
        sub = np.asarray(data if trivial_view(view)
                         else data[view])
        inc = np.asarray(self._include(data=data, view=view))
        inc = np.broadcast_to(inc, sub.shape)
        return sub[inc]

    def view(self, view=()):
        """numpy.ma compatibility: masked=True means excluded (reference
        masks.py:120-132)."""
        return self.exclude(view=view)

    def quicklook(self, view, wcs=None, filename=None, use_aplpy=None,
                  aplpy_kwargs=None):
        """Plot a 2-D slice of the mask (reference masks.py:272-335)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as _np
        img = _np.asarray(self.include(view=view))
        if img.ndim != 2:
            raise ValueError("view must return a 2D slice")
        fig, ax = plt.subplots()
        ax.imshow(img, origin="lower", interpolation="nearest")
        if filename:
            fig.savefig(filename)
        return ax

    def any(self, data=None, view=()):
        return bool(np.any(np.asarray(self._include(data=data, view=view))))

    # -- composition ---------------------------------------------------------
    # make `bool_array & mask` dispatch to __rand__ instead of numpy's
    # elementwise bitwise_and over the mask object
    __array_ufunc__ = None

    @staticmethod
    def _as_mask(other):
        """Coerce a bool array operand into a BooleanArrayMask so
        ``cubemask & (projection > threshold)`` works like the reference
        (test_masks.py:569-583 composes a mask with a plain 2-D bool
        array)."""
        if isinstance(other, MaskBase):
            return other
        arr = np.asarray(other)
        if arr.dtype == np.bool_:
            return BooleanArrayMask(arr)
        return NotImplemented

    def __and__(self, other):
        other = self._as_mask(other)
        if other is NotImplemented:
            return NotImplemented
        return CompositeMask(self, other, operation="and")

    def __or__(self, other):
        other = self._as_mask(other)
        if other is NotImplemented:
            return NotImplemented
        return CompositeMask(self, other, operation="or")

    def __xor__(self, other):
        other = self._as_mask(other)
        if other is NotImplemented:
            return NotImplemented
        return CompositeMask(self, other, operation="xor")

    def __rand__(self, other):
        return self.__and__(other)

    def __ror__(self, other):
        return self.__or__(other)

    def __rxor__(self, other):
        return self.__xor__(other)

    def __invert__(self):
        return InvertedMask(self)

    # -- pickling ------------------------------------------------------------
    # jnp ufuncs (jnp.greater, jnp.isfinite, ...) don't pickle by
    # reference, and bound device arrays shouldn't cross process
    # boundaries raw; masks pickle like the reference's (masks.py
    # pickle tests) by tokenizing jnp functions and np-converting data.
    def __getstate__(self):
        state = dict(self.__dict__)
        fn = state.get("_function")
        name = getattr(fn, "__name__", "")
        if fn is not None and getattr(jnp, name, None) is fn:
            state["_function"] = ("__jnp__", name)
        if state.get("_data") is not None:
            state["_data"] = np.asarray(state["_data"])
        if state.get("_mask") is not None and \
                not isinstance(state["_mask"], (MaskBase, np.ndarray)):
            state["_mask"] = np.asarray(state["_mask"])
        return state

    def __setstate__(self, state):
        fn = state.get("_function")
        if isinstance(fn, tuple) and len(fn) == 2 and fn[0] == "__jnp__":
            state["_function"] = getattr(jnp, fn[1])
        self.__dict__.update(state)

    # -- structure ---------------------------------------------------------
    def __getitem__(self, view):
        return _ViewMask(self, view)

    def with_spectral_unit(self, unit, velocity_convention=None,
                           rest_value=None):
        """Copy of this mask with its stored WCS (if any) converted to the
        new spectral unit (reference masks.py:574-584 for
        BooleanArrayMask, :797-803 for WCS-less FunctionMask which simply
        copies; Inverted/Composite delegate to their children via the
        shared __dict__ walk below)."""
        import copy as _copy
        new = _copy.copy(self)
        wcs = getattr(new, "_wcs", None)
        if wcs is not None and wcs.naxis >= 3:
            new._wcs = _convert_wcs_spectral(wcs, unit, velocity_convention,
                                             rest_value)
        for attr in ("_mask1", "_mask2", "_mask", "_parent"):
            child = getattr(new, attr, None)
            if isinstance(child, MaskBase):
                setattr(new, attr, child.with_spectral_unit(
                    unit, velocity_convention=velocity_convention,
                    rest_value=rest_value))
        return new


class _ViewMask(MaskBase):
    """A mask restricted to a static view of its parent."""

    def __init__(self, parent, view):
        self._parent = parent
        self._view = view
        pshape = parent.shape
        if pshape is not None:
            self._shape = view_shape(pshape, view)

    def _wants_wcs(self):
        return self._parent._wants_wcs()

    def _include(self, data=None, view=(), wcs=None):
        kw = {"wcs": wcs} if (wcs is not None
                              and self._parent._wants_wcs()) else {}
        if data is not None:
            # the cube slices data and mask in lockstep, so the provided
            # data is ALREADY restricted to this mask's view — evaluate
            # the parent on it directly (the same convention LazyMask
            # uses when it drops its view on slicing) and forward only
            # the residual view
            return self._parent._include(data=data, view=view, **kw)
        # shape-only evaluation: compose the stored view, then slice
        inc = self._parent._include(view=self._view, **kw)
        if trivial_view(view):
            return inc
        return inc[view]


class InvertedMask(MaskBase):
    def __init__(self, mask):
        self._mask = mask
        self._shape = mask.shape

    def _include(self, data=None, view=(), wcs=None):
        inc = self._mask._include(data=data, view=view, wcs=wcs) \
            if self._mask._wants_wcs() \
            else self._mask._include(data=data, view=view)
        if isinstance(inc, np.ndarray):
            return ~inc
        return jnp.logical_not(inc)

    def _wants_wcs(self):
        return self._mask._wants_wcs()

    def __getitem__(self, view):
        return InvertedMask(self._mask[view])


class CompositeMask(MaskBase):
    """Lazy binary and/or/xor of two masks (reference masks.py:364-455)."""

    def __init__(self, mask1, mask2, operation="and"):
        if isinstance(mask1, MaskBase) and isinstance(mask2, MaskBase):
            s1, s2 = mask1.shape, mask2.shape
            if s1 is not None and s2 is not None:
                if not (is_broadcastable_and_smaller(s1, s2)
                        or is_broadcastable_and_smaller(s2, s1)):
                    raise ValueError(
                        f"mask shapes {s1} and {s2} are not broadcastable")
        self._mask1 = mask1
        self._mask2 = mask2
        if operation not in ("and", "or", "xor"):
            raise ValueError(f"unknown operation {operation!r}")
        self._operation = operation
        shapes = [m.shape for m in (mask1, mask2) if m.shape is not None]
        # the composite's extent is the BROADCAST of its operands (a
        # max-by-ndim pick returned whichever operand came first on
        # equal ndim, making shape order-dependent)
        self._shape = tuple(np.broadcast_shapes(*shapes)) if shapes \
            else None

    def _include(self, data=None, view=(), wcs=None):
        i1 = self._mask1._include(data=data, view=view, wcs=wcs) \
            if self._mask1._wants_wcs() \
            else self._mask1._include(data=data, view=view)
        i2 = self._mask2._include(data=data, view=view, wcs=wcs) \
            if self._mask2._wants_wcs() \
            else self._mask2._include(data=data, view=view)
        xp = np if (isinstance(i1, np.ndarray)
                    and isinstance(i2, np.ndarray)) else jnp
        if self._operation == "and":
            return xp.logical_and(i1, i2)
        if self._operation == "or":
            return xp.logical_or(i1, i2)
        return xp.logical_xor(i1, i2)

    def _wants_wcs(self):
        return self._mask1._wants_wcs() or self._mask2._wants_wcs()

    def __getitem__(self, view):
        return CompositeMask(self._mask1[view], self._mask2[view],
                             operation=self._operation)


class BooleanArrayMask(MaskBase):
    """A concrete boolean array, broadcastable up to cube shape.

    ``include=True`` means the array flags included pixels; ``include=False``
    means it flags excluded ones (reference masks.py:457-584).  1-D spectral
    masks are treated as shape (n, 1, 1) and 2-D spatial masks as
    (1, ny, nx), broadcast lazily (zero-copy, the jnp analog of the
    reference's zero-stride ``as_strided`` trick at masks.py:494-524).
    """

    def __init__(self, mask, wcs=None, shape=None, include=True):
        mask = np.asarray(mask) if isinstance(mask, (list, tuple)) else mask
        if mask.dtype != bool and mask.dtype != jnp.bool_:
            mask = mask.astype(bool)
        if not include:
            mask = ~np.asarray(mask)
        self._wcs = wcs
        full_shape = shape
        if shape is None and mask.ndim == 3:
            full_shape = mask.shape
        if full_shape is not None and mask.shape != tuple(full_shape):
            if mask.ndim == 1:
                mask = mask.reshape(mask.shape + (1, 1))
            elif mask.ndim == 2:
                mask = mask.reshape((1,) + mask.shape)
            if not is_broadcastable_and_smaller(mask.shape, full_shape):
                raise ValueError(
                    f"mask shape {mask.shape} not broadcastable to "
                    f"{full_shape}")
        self._mask = mask
        self._shape = tuple(full_shape) if full_shape is not None \
            else mask.shape

    def _include(self, data=None, view=()):
        m = self._full_mask()
        return m if trivial_view(view) else m[view]

    def _full_mask(self):
        """The stored mask broadcast (zero-copy) to the full cube shape, so
        any view — including integer indices — applies directly."""
        m = self._mask
        if m.shape == self._shape:
            return m
        xp = np if isinstance(m, np.ndarray) else jnp
        return xp.broadcast_to(m, self._shape)

    def __getitem__(self, view):
        new_mask = self._full_mask()[view]
        return BooleanArrayMask(new_mask, wcs=None, shape=new_mask.shape)


class LazyMask(MaskBase):
    """mask = ``function(data)`` evaluated on demand (reference masks.py:586).

    Unlike the reference (which binds a fixed data array at construction),
    the data flows in at evaluation time so the same mask works on any view
    of the cube inside jit; a fixed ``data`` may still be bound for API
    parity.
    """

    def __init__(self, function, cube=None, data=None, wcs=None, shape=None):
        self._function = function
        if cube is not None:
            data = cube._data
            wcs = getattr(cube, "_wcs", None)
        self._data = data
        self._wcs = wcs
        self._shape = shape if shape is not None else (
            tuple(np.shape(data)) if data is not None else None)

    def _include(self, data=None, view=()):
        d = data if data is not None else self._data
        if d is None:
            raise ValueError("LazyMask has no bound data and none was given")
        sub = d if trivial_view(view) else d[view]
        return self._function(sub)

    def __getitem__(self, view):
        """Slicing a data-local mask just tracks shape: the cube slices its
        data in lockstep, so evaluation applies the function to whatever
        (already-sliced) data it receives."""
        new_shape = view_shape(self._shape, view) \
            if self._shape is not None else None
        return LazyMask(self._function,
                        data=self._data[view] if self._data is not None
                        else None, wcs=self._wcs, shape=new_shape)


class LazyComparisonMask(MaskBase):
    """mask = ``function(data, comparison_value)`` — how ``cube > 0.5*u.K``
    works (built by operators at reference spectral_cube.py:2263-2296)."""

    def __init__(self, function, comparison_value, cube=None, data=None,
                 wcs=None, shape=None):
        self._function = function
        self._comparison_value = comparison_value
        if cube is not None:
            data = cube._data
            wcs = getattr(cube, "_wcs", None)
        self._data = data
        self._wcs = wcs
        self._shape = shape if shape is not None else (
            tuple(np.shape(data)) if data is not None else None)

    def _include(self, data=None, view=()):
        d = data if data is not None else self._data
        if d is None:
            raise ValueError("mask has no bound data and none was given")
        sub = d if trivial_view(view) else d[view]
        cv = self._comparison_value
        if np.ndim(cv) > 0 and not trivial_view(view):
            # array-valued thresholds (per-channel cuts) are positional:
            # slice them in lockstep with the data view
            cv = np.broadcast_to(np.asarray(cv), np.shape(d))[view]
        return self._function(sub, cv)

    def __getitem__(self, view):
        new_shape = view_shape(self._shape, view) \
            if self._shape is not None else None
        cv = self._comparison_value
        if np.ndim(cv) > 0 and self._shape is not None \
                and not trivial_view(view):
            cv = np.ascontiguousarray(
                np.broadcast_to(np.asarray(cv), self._shape)[view])
        return LazyComparisonMask(
            self._function, cv,
            data=self._data[view] if self._data is not None else None,
            wcs=self._wcs, shape=new_shape)


class FunctionMask(MaskBase):
    """mask = ``function(data, wcs, view)`` computed at call time
    (reference masks.py:760-801)."""

    def __init__(self, function, shape=None, wcs=None):
        self._function = function
        self._shape = shape
        self._wcs = wcs

    def _include(self, data=None, view=(), wcs=None):
        result = self._function(data, wcs if wcs is not None else self._wcs,
                                view)
        sub = data if trivial_view(view) else data[view]
        if data is not None and np.shape(result) != np.shape(sub):
            raise ValueError("Function did not return mask with correct shape")
        return result

    def _wants_wcs(self):
        return True
