#!/usr/bin/env node
// Golden generator: replays fixed deterministic input sequences through the
// reference library (/root/reference, read-only) and dumps JSON goldens used
// by the Scala parity tests (src/test/resources/golden/).
// Run: node scripts/gen_goldens.js
'use strict';
const fs = require('fs');
const path = require('path');

const ref = '/root/reference/src';
const hash = require(path.join(ref, 'hash.js'));
const Bloom = require(path.join(ref, 'bloom.js'));
const CountMin = require(path.join(ref, 'count-min.js'));
const CountMeanMin = require(path.join(ref, 'count-mean-min.js'));
const NGram = require(path.join(ref, 'ngram.js'));
const StreamSummary = require(path.join(ref, 'stream-summary.js'));
const TDigest = require(path.join(ref, 't-digest.js'));

const outDir = path.join(__dirname, '..', 'src', 'test', 'resources', 'golden');
fs.mkdirSync(outDir, { recursive: true });
const dump = (name, obj) =>
  fs.writeFileSync(path.join(outDir, name), JSON.stringify(obj));

// deterministic LCG for value sequences (replicated in Scala tests)
function lcg(seed) {
  let s = seed >>> 0;
  return function () {
    s = (Math.imul(s, 1664525) + 1013904223) >>> 0;
    return s / 4294967296;
  };
}

// ---- hash vectors ----
const hashStrings = ['', 'a', 'abc', 'hello world', '•', 'café',
  '😀', 'conv-00000001', 'search', 'bash',
  'the quick brown fox jumps over the lazy dog'];
for (let i = 0; i < 50; ++i) hashStrings.push('v' + i);
const locCfg = [[5, 1024], [3, 1021], [9, 27191], [1, 32]];
dump('hash.json', {
  strings: hashStrings,
  fnv_1a: hashStrings.map(hash.fnv_1a),
  fnv_1a_b: hashStrings.map(s => hash.fnv_1a_b(hash.fnv_1a(s))),
  locations: locCfg.map(([d, w]) => ({
    d, w,
    rows: hashStrings.map(s => {
      const ctx = { _d: d, _w: w };
      hash.init.call(ctx);
      return Array.from(hash.locations.call(ctx, s));
    })
  }))
});

// ---- bloom ----
const set1 = 'abcdefghij'.split('');
const set2 = 'klmnopqrst'.split('');
const set3 = '123456789•'.split('');
function bloomCase(w, d, addA, addB) {
  const a = new Bloom(w, d), b = new Bloom(w, d);
  addA.forEach(v => a.add(v));
  addB.forEach(v => b.add(v));
  const u = a.union(b);
  const probes = addA.concat(addB, set3, ['zz', 'yy', 'xx']);
  return {
    w, d, addA, addB,
    exportA: a.export(), exportB: b.export(), exportU: u.export(),
    queryA: probes.map(v => a.query(v)),
    queryU: probes.map(v => u.query(v)),
    sizeA: a.size(), sizeB: b.size(), sizeU: u.size(),
    jaccard: a.jaccard(b), cover: a.cover(b)
  };
}
dump('bloom.json', {
  cases: [
    bloomCase(1024, 1, set1, set2),
    bloomCase(300, 3, set1, set1.concat(set2)), // width rounds up to 320
    bloomCase(1024 * 8, 5, hashStrings, set3)
  ],
  create: [[1000, 0.02], [1000000, 0.02], [500, 0.001]].map(([n, p]) => {
    const f = Bloom.create(n, p);
    return { n, p, w: f._w, d: f._d };
  })
});

// ---- count-min / count-mean-min ----
function cmsCase(Ctor, w, d, weighted) {
  const a = new Ctor(w, d), b = new Ctor(w, d);
  const addsA = [], addsB = [];
  set1.forEach((v, i) => { for (let j = 0; j <= i; ++j) { a.add(v); addsA.push(v); } });
  set2.concat(set1.slice(0, 5)).forEach((v, i) => {
    for (let j = 0; j < 2 * i + 1; ++j) { b.add(v); addsB.push(v); }
  });
  const probes = set1.concat(set2, set3);
  return {
    w: a._w, d: a._d, addsA, addsB,
    exportA: a.export(), exportB: b.export(),
    queryA: probes.map(v => a.query(v)),
    queryB: probes.map(v => b.query(v)),
    dot: a.dot(b)
  };
}
dump('cms.json', {
  cases: [cmsCase(CountMin, 1021, 3), cmsCase(CountMin, 0, 0)],
  create: [[0, 0, 0], [1000, 10, 0.01], [1e6, 100, 0.001]].map(([n, e, p]) => {
    const s = CountMin.create(n, e, p);
    return { n, e, p, w: s._w, d: s._d };
  })
});
dump('cmm.json', { cases: [cmsCase(CountMeanMin, 1021, 3), cmsCase(CountMeanMin, 0, 0)] });

// ---- ngram ----
const sA = 'aBabcdefghij', sB = 'bcbcefhikln';
function ngramCase(n, cs) {
  const a = new NGram(n, cs), b = new NGram(n, cs);
  a.add(sA); b.add(sB);
  a.add('the quick brown fox');
  return {
    n, cs, sA: sA, sB: sB, extra: 'the quick brown fox',
    exportA: a.export(), exportB: b.export(),
    sizeA: a.size(), sizeB: b.size(),
    normA: a.norm(), normB: b.norm(),
    dot: a.dot(b), cosine: a.cosine(b),
    queries: ['ab', 'aB', 'bc', 'zz', 'e '].map(k => [a.query(k), b.query(k)])
  };
}
dump('ngram.json', { cases: [ngramCase(2, false), ngramCase(2, true), ngramCase(3, false)] });

// ---- stream summary ----
function ssCase(w, script) {
  const ss = new StreamSummary(w);
  script.forEach(([v, c]) => ss.add(v, c));
  const probes = ['1', '2', '3', '4', '5', 'a', 'b', 'q'];
  return {
    w, script,
    export: ss.export(),
    values: ss.values(), counts: ss.counts(), errors: ss.errors(),
    top2values: ss.values(2), top2counts: ss.counts(2),
    query: probes.map(v => ss.query(v)),
    error: probes.map(v => ss.error(v))
  };
}
const script1 = [['1'], ['2'], ['2'], ['2'], ['3'], ['1'], ['1'], ['4'], ['4', 4]]
  .map(x => [x[0], x[1] || 1]);
const r1 = lcg(7);
const script2 = [];
for (let i = 0; i < 500; ++i) {
  const v = 'k' + Math.floor(Math.pow(r1(), 2) * 20); // skewed toward low keys
  script2.push([v, 1 + Math.floor(r1() * 3)]);
}
dump('stream-summary.json', { cases: [ssCase(3, script1), ssCase(10, script2), ssCase(100, script2)] });

// ---- t-digest ----
function tdCase(nc, values) {
  const td = new TDigest(nc);
  values.forEach(v => td.add(v));
  const qs = [0, 0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 1];
  const cdfs = [-0.5, 0, 0.1, 0.25, 0.5, 0.9, 1.0, 1.5];
  return {
    nc, values,
    export: td.export(),
    size: td.size(),
    quantiles: qs.map(q => [q, td.quantile(q)]),
    cdfs: cdfs.map(v => [v, td.cdf(v)])
  };
}
const r2 = lcg(42);
const vals1 = [];
for (let i = 0; i < 5000; ++i) vals1.push(r2());
const r3 = lcg(123);
const vals2 = [];
for (let i = 0; i < 300; ++i) vals2.push(Math.floor(r3() * 100)); // many ties
dump('tdigest.json', {
  cases: [tdCase(100, vals1), tdCase(100, vals2), tdCase(20, vals1.slice(0, 1000)), tdCase(100, [0.42]), tdCase(100, [])],
  numTemp: [1, 2, 10, 20, 100, 500, 1000].map(n => {
    const td = new TDigest(n);
    return { nc: n, temp: td._tempWeight.length };
  })
});

console.log('goldens written to ' + outDir);
