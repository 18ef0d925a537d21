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


def test_string_patterns_find_match():
    out = run(
        """
        local b, e, cap = string.find("hello world 42!", "(%d+)")
        local word = string.match("  key = value  ", "^%s*(%a+)")
        local k, v = string.match("width=512", "(%w+)=(%w+)")
        local anchored = string.match("abc", "^a%l+$")
        local none = string.match("abc", "%d")
        return b, e, cap, word, k, v, anchored, none == nil
        """
    )
    assert out == [13.0, 14.0, "42", "key", "width", "512", "abc", True]


def test_string_patterns_gsub():
    out = run(
        """
        local s1, n1 = string.gsub("hello world", "o", "0")
        local s2, n2 = string.gsub("hello world", "o", "0", 1)
        local s3 = string.gsub("hello world", "(%w+)", "<%1>")
        local s4 = string.gsub("abc=1,def=2", "(%a+)=(%d+)", "%2:%1")
        local s5 = string.gsub("hello", "l+", function(m) return "[" .. m .. "]" end)
        local t = {name = "lua"}
        local s6 = string.gsub("$name is here", "%$(%w+)", t)
        return s1, n1, s2, n2, s3, s4, s5, s6
        """
    )
    assert out == [
        "hell0 w0rld", 2.0, "hell0 world", 1.0,
        "<hello> <world>", "1:abc,2:def", "he[ll]o", "lua is here",
    ]


def test_string_patterns_gmatch_and_classes():
    out = run(
        """
        local words = {}
        for w in string.gmatch("one two  three", "%a+") do
            table.insert(words, w)
        end
        local pairs_found = {}
        for k, v in string.gmatch("a=1, b=2", "(%w+)=(%w+)") do
            table.insert(pairs_found, k .. v)
        end
        local balanced = string.match("f(a(b)c)d", "%b()")
        local set = string.match("x [10..20] y", "%[([%d.]+)%]")
        local pos = select(2, string.find("abcd", "()c()"))
        return words[1], words[2], words[3], pairs_found[1], pairs_found[2],
               balanced, set, #words
        """
    )
    assert out == [
        "one", "two", "three", "a1", "b2", "(a(b)c)", "10..20", 3.0,
    ]


def test_string_patterns_backref_and_quantifiers():
    out = run(
        """
        local rep = string.match("abcabc", "(%a+)%1")
        local lazy = string.match("<a><b>", "<(.-)>")
        local greedy = string.match("<a><b>", "<(.*)>")
        local opt = string.match("color", "colou?r")
        local s, n = string.gsub("a.b.c", "%.", "/")
        local plain = string.find("a.b", ".", 1, true)
        return rep, lazy, greedy, opt, s, n, plain
        """
    )
    assert out == ["abc", "a", "a><b", "color", "a/b/c", 2.0, 2.0]
