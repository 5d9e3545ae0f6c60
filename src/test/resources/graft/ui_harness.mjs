// Headless render-exercise of the bundled graft UI against a live
// UiServer (driven by UiServerSpec through `node`): fetches the served
// page, boots its script under a minimal DOM stub, and drives the same
// entry points a browser would — trace load/select, overview graph
// construction over reference-shaped (records/nodes/child_trace) and
// flat engine-shaped (steps[]) fixtures, rule expansion into op chains,
// record navigation, op inspection, the api-graph view end to end over
// /internal/api-graph, and the persisted µs/ms unit toggle. Prints one
// PASS/FAIL line per check; exit code 0 iff all pass.
const base = process.env.UI_BASE ?? "http://127.0.0.1:8099";
const html = await (await fetch(base + "/")).text();
const script = html.match(/<script>([\s\S]*)<\/script>/)[1];

// ---- minimal DOM stub -------------------------------------------------
function makeEl(tag) {
  const el = {
    tagName: (tag || "div").toUpperCase(), id: "", className: "",
    style: {}, children: [], childNodes: [], textContent: "",
    attrs: {}, handlers: {},
    appendChild(c) { this.children.push(c); this.childNodes.push(c); return c; },
    setAttribute(k, v) { this.attrs[k] = v; },
    getAttribute(k) { return this.attrs[k]; },
    addEventListener(t, f) { (this.handlers[t] ||= []).push(f); },
    setPointerCapture() {},
    getBoundingClientRect() { return { left: 0, top: 0, width: 1200, height: 800 }; },
    set innerHTML(v) { this.children = []; this.childNodes = []; this._innerHTML = v; },
    get innerHTML() { return this._innerHTML ?? ""; },
    get lastChild() { return this.children[this.children.length - 1]; },
  };
  return el;
}
const byId = new Map();
const documentStub = {
  getElementById: (id) => byId.get(id) ?? (byId.set(id, makeEl("div")), byId.get(id)),
  createElement: (t) => makeEl(t),
  createElementNS: (_ns, t) => makeEl(t),
  createTextNode: (t) => ({ textContent: t, tagName: "#text" }),
};
const storage = new Map();
const localStorageStub = {
  getItem: (k) => storage.get(k) ?? null,
  setItem: (k, v) => storage.set(k, v),
};
const realFetch = globalThis.fetch;
const fetchStub = (path) => realFetch(base + path);

// ---- boot the app script ---------------------------------------------
const sandbox = Function(
  "document", "localStorage", "fetch", "window",
  script + "\n;return { S, buildTraceGraph, buildApiGraph, ruleOps, layout, " +
  "currentGraph, onNodeClick, renderAll, selectTrace, loadApiGraph, setUnit };");
const app = sandbox(documentStub, localStorageStub, fetchStub, {});

const sleep = (ms) => new Promise((r) => setTimeout(r, ms));
let failures = 0;
function check(name, cond) {
  if (cond) console.log("PASS " + name);
  else { failures++; console.log("FAIL " + name); }
}

await sleep(1000); // initial loadTraces + selectTrace(newest)

check("traces loaded newest-first", app.S.traces.length === 2 &&
  app.S.traces[0].trace_id === "t-nested");
check("newest trace auto-selected with payload", app.S.trace &&
  app.S.trace.trace_id === "t-nested");

// ---- overview graph over the nested reference-shaped trace ------------
let g = app.buildTraceGraph(app.S.trace);
const nid = (id) => g.nodes.find((n) => n.id === id);
check("root rule node present", !!nid("rules/orders.yaml"));
check("child_trace rule node present", !!nid("rules/shape.yaml"));
check("branch then-ref node present (else filtered)",
  !!nid("rules/vip.yaml") && !nid("rules/std.yaml"));
check("edge root->shape with duration", g.edges.some((e) =>
  e.from === "rules/orders.yaml" && e.to === "rules/shape.yaml" && e.durUs === 900));
check("branch edge labeled", g.edges.some((e) =>
  e.to === "rules/vip.yaml" && /branch/.test(e.label ?? "")));
check("error propagates to root rule", !!g.errorIds["rules/orders.yaml"]);
app.layout(g.nodes, g.edges);
check("layout: shape node right of root",
  nid("rules/shape.yaml").x > nid("rules/orders.yaml").x);

// ---- expand the child rule: op chain + inspector ----------------------
app.onNodeClick(nid("rules/shape.yaml"));
check("rule expanded", app.S.expanded.includes("rules/shape.yaml"));
let ops = app.ruleOps(app.S.trace, "rules/shape.yaml", 0);
check("ops of record 0", ops.length === 2 && ops[0].label === "trim name");
let merged = app.currentGraph();
check("expanded graph holds op nodes chained", merged.nodes.some((n) =>
  n.id === "rules/shape.yaml::op0") && merged.edges.some((e) =>
  e.from === "rules/shape.yaml::op0" && e.to === "rules/shape.yaml::op1"));
const opNode = merged.nodes.find((n) => n.id === "rules/shape.yaml::op0");
app.onNodeClick(opNode);
check("op click opens inspector on the op",
  app.S.inspectorOpen && app.S.selectedOp === opNode.op);

// ---- OP-result deep view: pipe/args blocks + pipe-steps transition ----
function collectText(el, out) {
  if (!el || typeof el !== "object") return out;
  if (el.textContent) out.push(String(el.textContent));
  (el.children || []).forEach((c) => collectText(c, out));
  return out;
}
app.renderAll();
const inspText = collectText(documentStub.getElementById("inspBody"), []).join("\n");
check("op result renders pipe + args blocks",
  inspText.includes("pipe") && inspText.includes("args"));
check("op result renders the pipe-steps transition",
  inspText.includes("pipe steps") && inspText.includes("@input.name") &&
  inspText.includes("trim"));
check("pipe step values surface in order",
  inspText.indexOf('" a "') >= 0 && inspText.indexOf('"a"') >= 0);

// ---- records navigation on the root rule ------------------------------
app.S.expanded = []; app.S.inspectorOpen = false;
app.onNodeClick(nid("rules/orders.yaml"));
app.S.recordIndex = 1;
ops = app.ruleOps(app.S.trace, "rules/orders.yaml", 1);
check("record #1 ops (error record)", ops.length === 1 && ops[0].status === "error");
check("record meta surfaces record_when/asserts_ok",
  ops[0].meta.record_when === true && ops[0].meta.asserts_ok === false);

// ---- flat engine-shaped trace ----------------------------------------
await app.selectTrace("t-flat"); await sleep(500);
g = app.buildTraceGraph(app.S.trace);
check("flat trace: steps become child nodes",
  g.nodes.some((n) => n.id === "rules/shape.yaml") &&
  g.nodes.some((n) => n.id === "rules/enrich.yaml"));
check("flat trace: skipped step edge labeled", g.edges.some((e) =>
  e.to === "rules/enrich.yaml" && e.label === "skipped"));
check("flat trace: no error ids", Object.keys(g.errorIds).length === 0);
app.onNodeClick(g.nodes.find((n) => n.id === "rules/endpoint.yaml"));
ops = app.ruleOps(app.S.trace, "rules/endpoint.yaml", 0);
check("flat trace: root expands to step ops", ops.length === 2 &&
  ops[1].status === "skipped");

// ---- api view end to end over /internal/api-graph ---------------------
await app.loadApiGraph(); await sleep(300);
check("api graph fetched", !!app.S.apiGraph && app.S.apiGraph.nodes.length >= 2);
const ag = app.buildApiGraph(app.S.apiGraph);
check("api graph has endpoint + normal nodes",
  ag.nodes.some((n) => /endpoint/.test(n.sub)) &&
  ag.nodes.some((n) => /normal/.test(n.sub)));
check("api graph edges labeled with kind", ag.edges.every((e) => e.label));
app.S.view = "api"; app.S.expanded = [];
const apiRule = ag.nodes.find((n) => (n.api.ops ?? []).length > 0);
app.onNodeClick(apiRule);
merged = app.currentGraph();
check("api rule expands into op chain", merged.nodes.some((n) =>
  n.id === apiRule.id + "::op0"));
check("api expand selects the rule for the inspector",
  app.S.selectedApiNode === apiRule.api);

// ---- unit toggle persistence + renders -------------------------------
app.setUnit("ms");
check("unit persisted to localStorage", storage.get("graft.unit") === "ms");
app.S.view = "trace"; app.renderAll();
app.S.view = "api"; app.renderAll();
check("renderAll completes in both views", true);

console.log(failures === 0 ? "ALL PASS" : failures + " FAILURES");
process.exit(failures === 0 ? 0 : 1);
