from pyrite_tpu.lua import Interpreter, LuaTable


def run(src, **kwargs):
    return Interpreter(**kwargs).run(src)


def test_basics():
    out = run(
        """
        local t = {1, 2, 3, x = 10}
        local sum = 0
        for _, v in ipairs(t) do sum = sum + v end
        for _, v in pairs({a = 1, b = 2}) do sum = sum + v end
        return sum + t.x, #t
        """
    )
    assert out == [19.0, 3.0]


def test_metatables_and_methods():
    out = run(
        """
        local mt = {}
        mt.__index = mt
        mt.__add = function(a, b) return setmetatable({v = a.v + b.v}, mt) end
        mt.__eq = function(a, b) return a.v == b.v end
        function mt:get() return self.v end
        local a = setmetatable({v = 5}, mt)
        local b = setmetatable({v = 3}, mt)
        local c = a + b
        return c:get(), c == setmetatable({v = 8}, mt)
        """
    )
    assert out == [8.0, True]


def test_closures_and_varargs():
    out = run(
        """
        local function counter()
            local n = 0
            return function() n = n + 1 return n end
        end
        local c = counter()
        c(); c()
        local function pack(...) return select("#", ...), ... end
        local n, a, b = pack("x", "y")
        return c(), n, a, b
        """
    )
    assert out == [3.0, 2.0, "x", "y"]


def test_string_and_control_flow():
    out = run(
        """
        local s = ""
        local i = 0
        while true do
            i = i + 1
            if i > 3 then break end
            s = s .. i
        end
        repeat i = i - 1 until i == 0
        return s, i, ("abc"):upper(), string.format("%.2f", 1.5)
        """
    )
    assert out == ["123", 0.0, "ABC", "1.50"]


def test_require_loader():
    sources = {"dep": "return {value = 42}"}
    interp = Interpreter(loader=lambda name: sources.get(name))
    out = interp.run('local dep = require "dep" return dep.value')
    assert out == [42.0]
    # modules are cached
    out2 = interp.run('return require("dep") == require("dep")')
    assert out2 == [True]


def test_numeric_for_and_table_lib():
    out = run(
        """
        local t = {}
        for i = 1, 5, 2 do table.insert(t, i) end
        table.insert(t, 1, 99)
        return table.concat(t, ","), #t
        """
    )
    assert out == ["99,1,3,5", 4.0]
