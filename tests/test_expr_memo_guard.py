import sys
sys.path.insert(0, "/root/repo")

def test_clear_all_clears_registered_caches():
    from entangledb_spark.functions import exprmemo
    calls = {"n": 0}
    @exprmemo.expr_template
    def tpl(x: int):
        calls["n"] += 1
        return ("tree", x)
    assert tpl(1) == ("tree", 1) and tpl(1) == ("tree", 1)
    assert calls["n"] == 1
    exprmemo.clear_all()
    tpl(1)
    assert calls["n"] == 2

def test_gateway_guard_clears_on_new_gateway_id():
    from entangledb_spark import session as S
    from entangledb_spark.functions import exprmemo
    cleared = {"n": 0}
    orig = exprmemo.clear_all
    exprmemo.clear_all = lambda: cleared.__setitem__("n", cleared["n"] + 1)
    class FakeGw: pass
    class FakeSC:
        def __init__(self): self._gateway = FakeGw()
    class FakeSpark:
        def __init__(self, sc): self.sparkContext = sc
    try:
        S._LAST_GATEWAY_ID[0] = None
        a, b = FakeSpark(FakeSC()), FakeSpark(FakeSC())
        S._guard_expr_memo(a)
        assert cleared["n"] == 0          # first sighting: nothing to clear
        S._guard_expr_memo(a)
        assert cleared["n"] == 0          # same gateway: no clear
        S._guard_expr_memo(b)
        assert cleared["n"] == 1          # new gateway: cleared
    finally:
        exprmemo.clear_all = orig
        S._LAST_GATEWAY_ID[0] = None
