"""Minimal Lua standard library for scene scripts."""

from __future__ import annotations

import math

from .interpreter import LuaTable, LuaError, lua_tostring, is_truthy


def install(interp):
    g = interp.globals

    def _print(*args):
        print("\t".join(lua_tostring(a) for a in args))

    def _type(value=None):
        if value is None:
            return "nil"
        if isinstance(value, bool):
            return "boolean"
        if isinstance(value, float):
            return "number"
        if isinstance(value, str):
            return "string"
        if isinstance(value, LuaTable):
            return "table"
        return "function"

    def _tostring(value=None):
        return lua_tostring(value)

    def _tonumber(value=None, base=None):
        if base is not None:
            try:
                return float(int(str(value), int(base)))
            except (ValueError, TypeError):
                return None
        if isinstance(value, float):
            return value
        if isinstance(value, str):
            try:
                return float(value)
            except ValueError:
                return None
        return None

    def _pairs(table):
        if not isinstance(table, LuaTable):
            raise LuaError("bad argument to 'pairs' (table expected)")
        items = list(table.hash.items())

        state = {"i": 0}

        def iterator(_state=None, _control=None):
            while state["i"] < len(items):
                k, v = items[state["i"]]
                state["i"] += 1
                if isinstance(k, int):
                    k = float(k)
                if table.get(k) is not None:
                    return (k, v)
            return None

        return (iterator, table, None)

    def _ipairs(table):
        def iterator(tbl, i):
            i = int(i) + 1
            v = tbl.get(float(i))
            if v is None:
                return None
            return (float(i), v)

        return (iterator, table, 0.0)

    def _next(table, key=None):
        items = list(table.hash.items())
        if key is None:
            idx = 0
        else:
            from .interpreter import _normkey

            nk = _normkey(key)
            idx = None
            for i, (k, _) in enumerate(items):
                if k == nk:
                    idx = i + 1
                    break
            if idx is None:
                raise LuaError("invalid key to 'next'")
        if idx < len(items):
            k, v = items[idx]
            if isinstance(k, int):
                k = float(k)
            return (k, v)
        return None

    def _setmetatable(table, meta=None):
        if not isinstance(table, LuaTable):
            raise LuaError("bad argument to 'setmetatable'")
        table.metatable = meta
        return table

    def _getmetatable(table=None):
        if isinstance(table, LuaTable):
            return table.metatable
        return None

    def _rawget(table, key):
        return table.get(key)

    def _rawset(table, key, value=None):
        table.set(key, value)
        return table

    def _rawequal(a=None, b=None):
        return a is b or a == b if not isinstance(a, LuaTable) else a is b

    def _require(name):
        return interp.require(name)

    def _error(message=None, _level=None):
        raise LuaError(lua_tostring(message))

    def _assert(value=None, message=None, *rest):
        if not is_truthy(value):
            raise LuaError(lua_tostring(message) if message is not None else "assertion failed!")
        return (value, message, *rest)

    def _pcall(func, *args):
        try:
            result = interp.call(func, list(args))
            return tuple([True] + result)
        except LuaError as e:
            return (False, str(e))

    def _select(what, *args):
        if what == "#":
            return float(len(args))
        i = int(what)
        return tuple(args[i - 1:])

    def _unpack(table, i=None, j=None):
        i = int(i) if i is not None else 1
        j = int(j) if j is not None else table.lua_len()
        return tuple(table.get(float(k)) for k in range(i, j + 1))

    for name, fn in {
        "print": _print,
        "type": _type,
        "tostring": _tostring,
        "tonumber": _tonumber,
        "pairs": _pairs,
        "ipairs": _ipairs,
        "next": _next,
        "setmetatable": _setmetatable,
        "getmetatable": _getmetatable,
        "rawget": _rawget,
        "rawset": _rawset,
        "rawequal": _rawequal,
        "require": _require,
        "error": _error,
        "assert": _assert,
        "pcall": _pcall,
        "select": _select,
        "unpack": _unpack,
    }.items():
        g.set(name, fn)

    # math ---------------------------------------------------------------
    math_table = LuaTable()
    for name, fn in {
        "floor": lambda x: float(math.floor(x)),
        "ceil": lambda x: float(math.ceil(x)),
        "abs": lambda x: abs(float(x)),
        "sqrt": lambda x: math.sqrt(x),
        "sin": math.sin,
        "cos": math.cos,
        "tan": math.tan,
        "asin": math.asin,
        "acos": math.acos,
        "atan": math.atan,
        "exp": math.exp,
        "log": lambda x, base=None: math.log(x, base) if base else math.log(x),
        "pow": lambda x, y: float(x) ** float(y),
        "fmod": math.fmod,
        "rad": math.radians,
        "deg": math.degrees,
        "max": lambda *xs: max(float(x) for x in xs),
        "min": lambda *xs: min(float(x) for x in xs),
        "modf": lambda x: (float(int(x)), x - int(x)),
    }.items():
        math_table.set(name, fn)
    math_table.set("pi", math.pi)
    math_table.set("huge", math.inf)
    g.set("math", math_table)

    # string ----------------------------------------------------------------
    def _format(fmt, *args):
        # Translate the common Lua format specs onto Python %-formatting.
        out = []
        arg_iter = iter(args)
        i = 0
        while i < len(fmt):
            c = fmt[i]
            if c == "%" and i + 1 < len(fmt):
                j = i + 1
                while j < len(fmt) and fmt[j] in "-+ #0123456789.":
                    j += 1
                spec = fmt[i : j + 1]
                kind = fmt[j]
                if kind == "%":
                    out.append("%")
                elif kind in "di":
                    out.append(("%" + spec[1:-1] + "d") % int(next(arg_iter)))
                elif kind in "fgGeE":
                    out.append(spec % float(next(arg_iter)))
                elif kind == "s":
                    out.append(spec % lua_tostring(next(arg_iter)))
                elif kind in "xX":
                    out.append(spec % int(next(arg_iter)))
                elif kind == "q":
                    out.append('"%s"' % lua_tostring(next(arg_iter)).replace('"', '\\"'))
                else:
                    raise LuaError(f"unsupported format spec %{kind}")
                i = j + 1
            else:
                out.append(c)
                i += 1
        return "".join(out)

    # full Lua 5.1 pattern engine (find/match/gmatch/gsub) — the reference
    # embeds real Lua (project/mod.rs:35-58 via mlua), so arbitrary user
    # scenes may use patterns even though the shipped scenes don't
    from . import patterns as _pat

    def _norm_init(s, init):
        n = len(s)
        i = int(init) if init is not None else 1
        if i < 0:
            i = max(n + i + 1, 1)
        elif i == 0:
            i = 1
        return i - 1  # 0-based; may equal n (empty-at-end matches allowed)

    def _str_find(s, pattern, init=None, plain=None):
        start = _norm_init(s, init)
        if start > len(s):
            return None
        if is_truthy(plain):
            idx = s.find(pattern, start)
            if idx < 0:
                return None
            return (float(idx + 1), float(idx + len(pattern)))
        found = _pat.pattern_find(s, pattern, start)
        if found is None:
            return None
        b, e, caps = found
        return tuple([float(b + 1), float(e)] + caps)

    def _str_match(s, pattern, init=None):
        start = _norm_init(s, init)
        if start > len(s):
            return None
        caps = _pat.pattern_match(s, pattern, start)
        if caps is None:
            return None
        return tuple(caps) if len(caps) > 1 else caps[0]

    def _str_gmatch(s, pattern):
        it = _pat.pattern_gmatch(s, pattern)

        def iterator(_state=None, _control=None):
            for caps in it:
                return tuple(caps) if len(caps) > 1 else caps[0]
            return None

        return iterator

    def _gsub_call(repl, caps):
        if isinstance(repl, LuaTable):
            return repl.get(caps[0])
        result = interp.call(repl, list(caps))
        return result[0] if result else None

    def _str_gsub(s, pattern, repl, n=None):
        new, count = _pat.pattern_gsub(
            s, pattern, repl,
            max_n=int(n) if n is not None else None, call=_gsub_call,
        )
        return (new, float(count))

    string_table = LuaTable()
    for name, fn in {
        "format": _format,
        "rep": lambda s, count, sep=None: ((sep or "").join([s] * int(count)) if sep else s * int(count)),
        "sub": lambda s, i, j=None: _str_sub(s, i, j),
        "upper": lambda s: s.upper(),
        "lower": lambda s: s.lower(),
        "len": lambda s: float(len(s)),
        "byte": lambda s, i=None: float(ord(s[int(i or 1) - 1])),
        "char": lambda *cs: "".join(chr(int(c)) for c in cs),
        "reverse": lambda s: s[::-1],
        "gsub": _str_gsub,
        "find": _str_find,
        "match": _str_match,
        "gmatch": _str_gmatch,
    }.items():
        string_table.set(name, fn)
    g.set("string", string_table)

    # table -------------------------------------------------------------
    def _insert(table, a, b=None):
        if b is None:
            table.set(float(table.lua_len() + 1), a)
        else:
            pos = int(a)
            for k in range(table.lua_len(), pos - 1, -1):
                table.set(float(k + 1), table.get(float(k)))
            table.set(float(pos), b)

    def _remove(table, pos=None):
        n = table.lua_len()
        if n == 0:
            return None
        pos = int(pos) if pos is not None else n
        value = table.get(float(pos))
        for k in range(pos, n):
            table.set(float(k), table.get(float(k + 1)))
        table.set(float(n), None)
        return value

    def _concat(table, sep=None, i=None, j=None):
        sep = sep or ""
        i = int(i) if i is not None else 1
        j = int(j) if j is not None else table.lua_len()
        return sep.join(lua_tostring(table.get(float(k))) for k in range(i, j + 1))

    def _sort(table, comp=None):
        import functools

        items = table.array_items()
        if comp is not None:
            def cmp(a, b):
                res = interp.call(comp, [a, b])
                return -1 if (res and is_truthy(res[0])) else 1
            items.sort(key=functools.cmp_to_key(cmp))
        else:
            items.sort()
        for idx, v in enumerate(items):
            table.set(float(idx + 1), v)

    table_table = LuaTable()
    for name, fn in {
        "insert": _insert,
        "remove": _remove,
        "concat": _concat,
        "sort": _sort,
        "unpack": _unpack,
    }.items():
        table_table.set(name, fn)
    g.set("table", table_table)

    # os/package stubs ------------------------------------------------------
    package = LuaTable()
    package.set("path", "./?.lua")
    g.set("package", package)
    g.set("_G", g)


def _str_sub(s, i, j=None):
    i = int(i)
    j = int(j) if j is not None else -1
    n = len(s)
    if i < 0:
        i = max(n + i + 1, 1)
    elif i == 0:
        i = 1
    if j < 0:
        j = n + j + 1
    elif j > n:
        j = n
    if i > j:
        return ""
    return s[i - 1 : j]


