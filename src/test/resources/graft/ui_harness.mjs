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
  "currentGraph, onNodeClick, renderAll, selectTrace, loadApiGraph, setUnit, " +
  "shouldResetInitialCenter };");
const app = sandbox(documentStub, localStorageStub, fetchStub, {});

const sleep = (ms) => new Promise((r) => setTimeout(r, ms));
let failures = 0;
function check(name, cond) {
  if (cond) console.log("PASS " + name);
  else { failures++; console.log("FAIL " + name); }
}

await sleep(1000); // initial loadTraces + selectTrace(newest)

// three traces: the two file fixtures plus the LIVE /api/combo trace the
// spec just drove through the engine (persisted now => newest)
const comboId = (app.S.traces.find((t) => t.trace_id.startsWith("trace-")) ?? {})
  .trace_id;
check("traces loaded newest-first (live combo first)",
  app.S.traces.length === 3 && app.S.traces[0].trace_id === comboId);
check("newest trace auto-selected with payload", app.S.trace &&
  app.S.trace.trace_id === comboId);
await app.selectTrace("t-nested"); await sleep(500);
check("fixture trace selected", app.S.trace.trace_id === "t-nested");

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
app.S.view = "api"; app.S.apiExpanded = [];
const apiRule = ag.nodes.find((n) => (n.api.ops ?? []).length > 0);
app.onNodeClick(apiRule);
merged = app.currentGraph();
check("api rule expands into op chain", merged.nodes.some((n) =>
  n.id === apiRule.id + "::op0"));
check("api expand selects the rule for the inspector",
  app.S.selectedApiNode === apiRule.api);
// interactive api-graph navigation: op click -> inspector op selection;
// collapse click -> selection cleared, focus falls back
const apiOpNode = merged.nodes.find((n) => n.id === apiRule.id + "::op0");
app.onNodeClick(apiOpNode);
check("api op click selects the op in the inspector",
  app.S.inspectorOpen && app.S.selectedApiOp === apiOpNode.op &&
  app.S.apiFocusedRuleId === apiRule.id);
app.onNodeClick(apiRule); // toggle: collapse
check("api collapse clears selection and focus",
  !app.S.apiExpanded.includes(apiRule.id) && app.S.selectedApiNode === null &&
  app.S.selectedApiOp === null && app.S.apiFocusedRuleId === null &&
  !app.S.inspectorOpen);

// ---- unit toggle persistence + renders -------------------------------
app.setUnit("ms");
check("unit persisted to localStorage", storage.get("graft.unit") === "ms");
app.S.view = "trace"; app.renderAll();
app.S.view = "api"; app.renderAll();
check("renderAll completes in both views", true);

// ---- LIVE branch-with-network-call trace through every view mode ------
// (the rich document the real engine persisted for POST /api/combo:
// endpoint -> staged.yaml [branch -> big.yaml] -> fetch2.yaml [network])
const tabTraces = documentStub.getElementById("tab-traces");
const tabGraph = documentStub.getElementById("tab-graph");
check("view_mode table matches the reference",
  app.shouldResetInitialCenter("api", "trace") === true &&
  app.shouldResetInitialCenter("trace", "api") === false &&
  app.shouldResetInitialCenter("trace", "trace") === false &&
  app.shouldResetInitialCenter("api", "api") === false);
app.S.pan = { x: 40, y: 9, k: 2 };
tabTraces.onclick(); // api -> trace: recenter
check("returning api->trace resets the canvas center",
  app.S.pan.x === 0 && app.S.pan.y === 0 && app.S.pan.k === 1);

await app.selectTrace(comboId); await sleep(500);
// view mode 1: trace OVERVIEW — rule-call graph, branch else filtered
check("combo opens in overview mode", app.S.expanded.length === 0 &&
  !app.S.inspectorOpen);
g = app.buildTraceGraph(app.S.trace);
const cn = (id) => g.nodes.find((n) => n.id === id);
check("combo overview: branch + network rules, else-path filtered",
  cn("./staged.yaml") && cn("./fetch2.yaml") && cn("./big.yaml") &&
  !cn("./small.yaml"));
check("combo overview: branch edge labeled with the taken path",
  g.edges.some((e) => e.to === "./big.yaml" && /branch: then/.test(e.label ?? "")));
check("combo overview: network edge carries the live duration",
  g.edges.some((e) => e.to === "./fetch2.yaml" && e.durUs > 0));

// view mode 2: trace DETAIL — expand the network rule: its child_trace's
// network step chains its request/select op children (buildDetailBundle)
app.onNodeClick(cn("./fetch2.yaml"));
check("combo detail mode entered", app.S.expanded.includes("./fetch2.yaml"));
ops = app.ruleOps(app.S.trace, "./fetch2.yaml", 0);
check("network rule ops: one network step node", ops.length === 1 &&
  ops[0].kind === "network" && (ops[0].children ?? []).length === 2);
merged = app.currentGraph();
const netOp = merged.nodes.find((n) => n.id === "./fetch2.yaml::op0");
const reqOp = merged.nodes.find((n) => n.id === "./fetch2.yaml::op0c0");
const selOp = merged.nodes.find((n) => n.id === "./fetch2.yaml::op0c1");
check("network step chains request -> select op children",
  netOp && reqOp && selOp &&
  merged.edges.some((e) => e.from === netOp.id && e.to === reqOp.id) &&
  merged.edges.some((e) => e.from === reqOp.id && e.to === selOp.id));
app.onNodeClick(selOp);
app.renderAll();
const selText = collectText(documentStub.getElementById("inspBody"), []).join("\n");
check("select op inspector renders its declared args",
  app.S.selectedOp === selOp.op && selText.includes("args") &&
  selText.includes("data"));

// the branch rule's child trace expands too (mapping children w/ pipe_steps)
app.onNodeClick(cn("./staged.yaml"));
ops = app.ruleOps(app.S.trace, "./staged.yaml", 0);
check("staged rule ops: mappings step + branch step", ops.length === 2 &&
  ops[1].kind === "branch" && ops[1].meta.branch_taken === "then");
merged = app.currentGraph();
check("mapping step chains its target op child", merged.nodes.some((n) =>
  n.id === "./staged.yaml::op0c0" && n.op.label === "doubled"));

// view mode 3: RAW JSON
app.S.inspectorOpen = true; app.S.rawMode = true; app.renderAll();
const rawText = collectText(documentStub.getElementById("inspBody"), []).join("\n");
check("raw mode renders the whole trace document",
  rawText.includes("child_trace") && rawText.includes("branch_taken") &&
  rawText.includes("fetch2.yaml"));

// view mode 4: API GRAPH via the real tab switch — fresh fetch, collapsed,
// and the TRACE view's expansion survives the round trip
const expandedBefore = app.S.expanded.slice();
app.S.apiGraph = { nodes: [], edges: [] }; // stale marker: must be refetched
tabGraph.onclick(); await sleep(500);
check("entering api view refetches the live graph",
  (app.S.apiGraph.nodes ?? []).length >= 2);
check("entering api view starts collapsed with no selection",
  app.S.apiExpanded.length === 0 && app.S.selectedApiNode === null &&
  app.S.apiFocusedRuleId === null && !app.S.inspectorOpen);
const ag2 = app.buildApiGraph(app.S.apiGraph);
check("api graph names the combo's rules", ["staged", "big", "fetch2"]
  .every((r) => ag2.nodes.some((n) => n.id.includes(r))));
const netRule = ag2.nodes.find((n) => n.id.includes("fetch2"));
app.onNodeClick(netRule);
merged = app.currentGraph();
check("api view: network rule expands into its static op chain",
  app.S.apiExpanded.includes(netRule.id) && merged.nodes.some((n) =>
  n.id === netRule.id + "::op0"));
tabTraces.onclick();
check("trace expansion survived the api round trip",
  app.S.view === "trace" &&
  JSON.stringify(app.S.expanded) === JSON.stringify(expandedBefore));

console.log(failures === 0 ? "ALL PASS" : failures + " FAILURES");
process.exit(failures === 0 ? 0 : 1);
