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


def test_goto_and_labels():
    # forward jump (loop continue idiom) and backward jump
    out = run(
        """
        local sum = 0
        for i = 1, 10 do
            if i % 2 == 0 then goto continue end
            sum = sum + i
            ::continue::
        end
        -- backward goto: retry loop without while
        local tries = 0
        ::again::
        tries = tries + 1
        if tries < 3 then goto again end
        return sum, tries
        """
    )
    assert out == [25.0, 3.0]


def test_goto_out_of_nested_block():
    out = run(
        """
        local hit = "no"
        do
            do
                goto done
            end
        end
        hit = "skipped"
        ::done::
        return hit
        """
    )
    assert out == ["no"]


def test_coroutines_basic():
    out = run(
        """
        local co = coroutine.create(function(a, b)
            local c = coroutine.yield(a + b)
            local d, e = coroutine.yield(c * 2)
            return d + e
        end)
        local ok1, v1 = coroutine.resume(co, 3, 4)   -- yields 7
        local ok2, v2 = coroutine.resume(co, 10)     -- yields 20
        local ok3, v3 = coroutine.resume(co, 1, 2)   -- returns 3
        local st = coroutine.status(co)
        local okd = coroutine.resume(co)             -- dead
        return ok1, v1, ok2, v2, ok3, v3, st, okd
        """
    )
    assert out == [True, 7.0, True, 20.0, True, 3.0, "dead", False]


def test_coroutine_wrap_generator():
    out = run(
        """
        local gen = coroutine.wrap(function()
            for i = 1, 4 do coroutine.yield(i * i) end
        end)
        local sum = 0
        for _ = 1, 4 do sum = sum + gen() end
        return sum, type(coroutine.create(function() end))
        """
    )
    assert out == [30.0, "thread"]


def test_coroutine_error_propagates_to_resume():
    out = run(
        """
        local co = coroutine.create(function() error("boom") end)
        local ok, msg = coroutine.resume(co)
        return ok, msg, coroutine.status(co)
        """
    )
    assert out[0] is False
    assert "boom" in out[1]
    assert out[2] == "dead"


def test_io_os_stdlib(tmp_path):
    path = str(tmp_path / "f.txt")
    out = run(
        """
        local path = %r
        local f = io.open(path, "w")
        f:write("alpha\\n", 42, "\\nbeta\\n")
        f:close()
        local r = io.open(path, "r")
        local first = r:read()
        local rest = r:read("*a")
        r:close()
        local count = 0
        for _ in io.lines(path) do count = count + 1 end
        local missing = io.open(path .. ".nope", "r")
        return first, rest, count, missing == nil,
            os.time() > 0, os.clock() >= 0, type(os.date("*t")) == "table",
            os.difftime(5, 2)
        """
        % path
    )
    assert out == ["alpha", "42\nbeta\n", 3.0, True, True, True, True, 3.0]


def test_math_random_and_xpcall():
    out = run(
        """
        math.randomseed(7)
        local a = math.random()
        local b = math.random(10)
        local c = math.random(5, 6)
        local ok, handled = xpcall(function() error("x") end,
                                   function(m) return "H:" .. m end)
        return a >= 0 and a < 1, b >= 1 and b <= 10, c >= 5 and c <= 6,
            ok, handled
        """
    )
    assert out[:4] == [True, True, True, False]
    assert out[4].startswith("H:")


def test_load_loadstring_dofile(tmp_path):
    path = str(tmp_path / "mod.lua")
    with open(path, "w") as fh:
        fh.write("local a, b = ...\nreturn (a or 0) + (b or 0) + 10\n")
    out = run(
        """
        local f = load("return 1 + 2")
        local bad, msg = load("return +")
        local g = loadstring("local x = ... return x * 2")
        return f(), bad == nil, type(msg) == "string", g(21), dofile(%r)
        """
        % path
    )
    assert out == [3.0, True, True, 42.0, 10.0]
